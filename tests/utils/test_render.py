"""Trajectory renderer: npy rotation loading + GIF/PNG output."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from flashmd_tpu.utils.render import load_coords, main, render_gif, render_png


@pytest.fixture()
def coords_prefix(tmp_path):
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 5, (2, 1, 8, 3))
    # two rotation files, 3 + 2 frames
    np.save(
        tmp_path / "demo_coords_0000.npy",
        np.concatenate([base + i * 0.1 for i in range(3)], axis=1),
    )
    np.save(
        tmp_path / "demo_coords_0001.npy",
        np.concatenate([base + i * 0.1 for i in (3, 4)], axis=1),
    )
    return str(tmp_path / "demo")


def test_load_concatenates_rotation(coords_prefix):
    coords = load_coords(coords_prefix)
    assert coords.shape == (2, 5, 8, 3)


def test_png_and_gif(coords_prefix, tmp_path):
    coords = load_coords(coords_prefix)
    png = render_png(coords, str(tmp_path / "f.png"), sim=1, frame=-1)
    gif = render_gif(coords, str(tmp_path / "t.gif"), sim=0, stride=2, fps=4)
    assert (tmp_path / "f.png").stat().st_size > 0
    assert (tmp_path / "t.gif").stat().st_size > 0
    assert png.endswith(".png") and gif.endswith(".gif")


def test_cli_main(coords_prefix, tmp_path, capsys):
    rc = main(
        [coords_prefix, "--png", str(tmp_path / "cli.png"), "--frame", "0"]
    )
    assert rc == 0
    assert (tmp_path / "cli.png").exists()


def test_cli_rejects_bad_sim(coords_prefix, tmp_path):
    with pytest.raises(SystemExit):
        main([coords_prefix, "--sim", "9", "--png", str(tmp_path / "x.png")])


def test_missing_prefix_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_coords(str(tmp_path / "nope"))
