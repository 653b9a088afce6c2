from mtad_gat_tpu.utils.plotting import plot_losses, Plotter

__all__ = ["plot_losses", "Plotter"]
