"""CLI harness tests (cli.main invoked in-process)."""

import numpy as np
import pytest

from oclpathtracer_tpu.cli import main
from oclpathtracer_tpu.render.image import read_ppm


def test_cli_info(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "devices" in out


def test_cli_render_primary_png(tmp_path, capsys):
    out = str(tmp_path / "img.png")
    rc = main(["render", "--width", "32", "--height", "32", "--spp", "1",
               "--integrator", "primary", "-o", out])
    assert rc == 0
    assert (tmp_path / "img.png").stat().st_size > 100


def test_cli_render_ppm_reference_quirk(tmp_path):
    out = str(tmp_path / "img.ppm")
    rc = main(["render", "--width", "16", "--height", "16", "--spp", "1",
               "--integrator", "primary", "-o", out, "--reference-quirk"])
    assert rc == 0
    img = read_ppm(out)
    assert img.shape == (16, 16, 3)
    assert img.max() <= 255


@pytest.mark.slow  # interpret-mode kernel render dominates wall-time
def test_cli_render_pallas_small(tmp_path):
    out = str(tmp_path / "p.png")
    rc = main(["render", "--width", "32", "--height", "32", "--spp", "2",
               "--bounces", "2", "--integrator", "pallas", "-o", out])
    assert rc == 0


def test_cli_bad_integrator_rejected():
    with pytest.raises(SystemExit):
        main(["render", "--integrator", "nonsense"])
