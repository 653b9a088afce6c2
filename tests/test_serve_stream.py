"""Serving stream hygiene: time-based partial-chunk flush, bad-line policy.

No reference counterpart — the reference has no serving path; this is our
surface (cli/serve_cli.py), pinned per the round-4 verdict: a slow live
stream must emit records without waiting for the chunk to fill or for EOF,
and one malformed line must not kill the server.
"""

import os
import sys
import threading
import time

import numpy as np
import pytest

from mtad_gat_tpu.cli.serve_cli import _parse_row, _stream_chunks

K = 3


def _pipe_stream(monkeypatch):
    """A real OS pipe wired up as the '-' (stdin) source."""
    r, w = os.pipe()
    fh = os.fdopen(r, "r")
    monkeypatch.setattr(sys, "stdin", fh)
    return w


def test_trickle_flushes_before_chunk_fills(monkeypatch):
    """2 rows on a chunk-128 server must surface within ~flush_ms, with the
    pipe still open (no EOF)."""
    w = _pipe_stream(monkeypatch)
    os.write(w, b"1,2,3\n4,5,6\n")
    gen = _stream_chunks("-", K, chunk=128, flush_ms=150.0)
    t0 = time.monotonic()
    batch = next(gen)
    elapsed = time.monotonic() - t0
    assert batch.shape == (2, K)
    np.testing.assert_array_equal(batch, [[1, 2, 3], [4, 5, 6]])
    assert elapsed < 5.0  # flushed on the timer, not stuck until EOF
    os.close(w)
    with pytest.raises(StopIteration):
        next(gen)


def test_full_chunk_yields_without_timer(monkeypatch):
    w = _pipe_stream(monkeypatch)
    for i in range(4):
        os.write(w, f"{i},{i},{i}\n".encode())
    gen = _stream_chunks("-", K, chunk=2, flush_ms=60_000.0)
    assert next(gen).shape == (2, K)  # full chunk: no 60 s wait
    assert next(gen).shape == (2, K)
    os.close(w)


def test_stalled_stream_flushes_then_resumes(monkeypatch):
    """Rows buffered when the stream stalls are flushed by the timer; later
    rows keep flowing through the same generator."""
    w = _pipe_stream(monkeypatch)
    os.write(w, b"1,1,1\n")
    gen = _stream_chunks("-", K, chunk=8, flush_ms=100.0)
    assert next(gen).shape == (1, K)

    def _late_write():
        time.sleep(0.05)
        os.write(w, b"2,2,2\n3,3,3\n")
        os.close(w)

    t = threading.Thread(target=_late_write)
    t.start()
    batch = next(gen)
    t.join()
    assert batch.shape == (2, K)


def test_malformed_line_skipped_and_logged(tmp_path, capsys):
    src = tmp_path / "s.csv"
    src.write_text("1,2,3\nnot,a,number\n4,5\n7,8,9\n")
    batches = list(_stream_chunks(str(src), K, chunk=128, flush_ms=0))
    got = np.concatenate(batches)
    np.testing.assert_array_equal(got, [[1, 2, 3], [7, 8, 9]])
    err = capsys.readouterr().err
    assert "skipping malformed line 2" in err
    assert "skipping malformed line 3" in err  # wrong arity also skipped


def test_malformed_line_strict_raises(tmp_path):
    src = tmp_path / "s.csv"
    src.write_text("1,2,3\nbad\n")
    gen = _stream_chunks(str(src), K, chunk=1, flush_ms=0, bad_line="strict")
    assert next(gen).shape == (1, K)
    with pytest.raises(ValueError, match="line 2"):
        next(gen)


def test_final_unterminated_line(tmp_path):
    src = tmp_path / "s.csv"
    src.write_text("1,2,3\n4,5,6")  # no trailing newline
    batches = list(_stream_chunks(str(src), K, chunk=128, flush_ms=0))
    np.testing.assert_array_equal(
        np.concatenate(batches), [[1, 2, 3], [4, 5, 6]]
    )


def test_skip_lines_and_position_tracking(tmp_path):
    """Crash-resume plumbing: ``skip_lines`` fast-forwards rows a previous
    session already served, and ``pos`` tracks the line number covered by
    each yielded chunk — including blank and malformed lines, so a resume
    lands on exactly the next unseen row."""
    src = tmp_path / "s.csv"
    src.write_text("1,1,1\n2,2,2\n\nbad,line\n3,3,3\n4,4,4\n5,5,5\n")

    pos = [0]
    gen = _stream_chunks(str(src), K, chunk=2, flush_ms=0, pos=pos)
    first = next(gen)
    np.testing.assert_array_equal(first, [[1, 1, 1], [2, 2, 2]])
    assert pos[0] == 2          # two lines fully served
    rest = np.concatenate(list(gen))
    np.testing.assert_array_equal(rest, [[3, 3, 3], [4, 4, 4], [5, 5, 5]])
    assert pos[0] == 7          # blank + malformed lines counted too

    # resume from the recorded position: only unseen rows are yielded
    resumed = list(_stream_chunks(str(src), K, chunk=2, flush_ms=0,
                                  skip_lines=2))
    np.testing.assert_array_equal(
        np.concatenate(resumed), [[3, 3, 3], [4, 4, 4], [5, 5, 5]]
    )
    # resume at EOF position: nothing to serve
    assert list(_stream_chunks(str(src), K, chunk=2, flush_ms=0,
                               skip_lines=7)) == []


def test_multi_skip_lines_and_positions(tmp_path):
    """Per-stream resume plumbing for the fleet multiplexer: positions only
    advance through YIELDED rows (burst carry-over stays uncounted until
    its rows actually go out) and per-stream skips are independent."""
    from mtad_gat_tpu.cli.serve_cli import _stream_chunks_multi

    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    a.write_text("".join(f"{i},{i},{i}\n" for i in range(6)))
    b.write_text("".join(f"{10+i},0,0\n" for i in range(3)))

    pos = [0, 0]
    got_a, got_b = [], []
    for ba, bb in _stream_chunks_multi(
        [str(a), str(b)], K, chunk=2, flush_ms=0, pos=pos
    ):
        if ba.shape[0]:
            got_a.append(ba)
            assert pos[0] == int(ba[-1, 0]) + 1  # row i is line i+1
        if bb.shape[0]:
            got_b.append(bb)
    np.testing.assert_array_equal(
        np.concatenate(got_a)[:, 0], np.arange(6)
    )
    assert pos == [6, 3]

    # per-stream skip: stream a resumes at line 5, b from the start
    out = list(_stream_chunks_multi(
        [str(a), str(b)], K, chunk=8, flush_ms=0, skip_lines=[4, 0]
    ))
    np.testing.assert_array_equal(
        np.concatenate([ba for ba, _ in out])[:, 0], [4, 5]
    )
    np.testing.assert_array_equal(
        np.concatenate([bb for _, bb in out])[:, 0], [10, 11, 12]
    )


def test_parse_row_policies(capsys):
    assert _parse_row("1,2,3", 3, "skip", 1).tolist() == [1.0, 2.0, 3.0]
    assert _parse_row("x,y,z", 3, "skip", 2) is None
    with pytest.raises(ValueError, match="line 3"):
        _parse_row("x", 3, "strict", 3)
