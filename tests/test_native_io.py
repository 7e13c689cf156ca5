"""Native pipelined I/O: reader/writer round-trip and EOF semantics."""

import numpy as np
import pytest

from versatilefilmgrain_tpu.utils import native_io


pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native I/O toolchain unavailable")


def test_reader_writer_roundtrip(tmp_path):
    fb = 4096
    frames = [np.random.default_rng(i).integers(0, 256, fb, dtype=np.uint8)
              for i in range(7)]
    src = str(tmp_path / "a.bin")
    with open(src, "wb") as f:
        for fr in frames:
            fr.tofile(f)

    r = native_io.FrameReader(src, fb, nbuf=3)
    got = []
    while True:
        buf = r.next()
        if buf is None:
            break
        got.append(buf)
    r.close()
    assert len(got) == 7
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)

    dst = str(tmp_path / "b.bin")
    w = native_io.FrameWriter(dst, fb, nbuf=3)
    for fr in got:
        w.put(fr)
    w.close()
    assert open(dst, "rb").read() == open(src, "rb").read()


def test_reader_seek_and_partial(tmp_path):
    fb = 1000
    src = str(tmp_path / "c.bin")
    with open(src, "wb") as f:
        f.write(bytes(range(250)) * 10)  # 2.5 frames
    r = native_io.FrameReader(src, fb, nbuf=2, seek_frames=1)
    assert r.next() is not None    # frame 1
    assert r.next() is None        # partial frame 2 -> EOF
    r.close()
