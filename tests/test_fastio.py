"""Native text-file reader: parity with the Python parser, fallback paths."""

import numpy as np
import pytest

from edgeml_tpu.data import fastio, load_data


def test_native_library_builds():
    assert fastio.available(), "native fastio library failed to build"


def test_native_parse_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "dets"
    d.mkdir()
    names = []
    for i in range(20):
        n = rng.integers(0, 6)
        rows = [
            f"{rng.integers(0, 9)} "
            + " ".join(f"{v:.6f}" for v in rng.random(5))
            for _ in range(n)
        ]
        (d / f"im{i}.txt").write_text("\n".join(rows) + ("\n" if rows else ""))
        names.append(f"im{i}")

    got = load_data(str(d), names, with_conf=True)
    for name, g in zip(names, got):
        text = (d / f"{name}.txt").read_text().strip()
        if not text:
            assert g == ()
            continue
        want = np.array([line.split() for line in text.splitlines()], float)
        assert np.allclose(g[0], want[:, 0])
        assert np.allclose(g[2], want[:, -1])


def test_direct_load_txt_boxes(tmp_path):
    f1 = tmp_path / "a.txt"
    f1.write_text("1 0.1 0.2 0.3 0.4 0.9\n2 0.5 0.5 0.1 0.1 0.8\n")
    f2 = tmp_path / "b.txt"
    f2.write_text("")
    f3 = tmp_path / "missing.txt"
    out = fastio.load_txt_boxes([str(f1), str(f2), str(f3)], cols=6)
    assert out is not None
    assert out[0].shape == (2, 6)
    assert out[0][0, 0] == 1.0 and out[0][1, 5] == pytest.approx(0.8)
    assert out[1].shape == (0, 6)
    assert out[2] is None  # missing file -> python fallback signal
