"""EXR writer/reader roundtrip."""

import numpy as np

from yuki_tpu.app.exr import read_exr, write_exr


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((33, 47, 3), dtype=np.float32) * 10.0
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    back = read_exr(p)
    assert back.shape == img.shape
    assert np.array_equal(back, img)


def test_magic_rejected(tmp_path):
    p = tmp_path / "bad.exr"
    p.write_bytes(b"not an exr")
    try:
        read_exr(str(p))
        assert False
    except ValueError:
        pass
