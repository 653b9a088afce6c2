"""Multi-host helper tests (single-process semantics + slicing logic)."""

import numpy as np

from mtad_gat_tpu.parallel.multihost import host_local_starts, initialize, process_info


def test_initialize_single_host_noop():
    initialize()  # must not raise in single-process mode
    pid, pcount = process_info()
    assert pid == 0 and pcount == 1


def test_host_local_starts_single_host():
    starts = np.arange(12).reshape(3, 4)
    np.testing.assert_array_equal(host_local_starts(starts, 1), starts)
