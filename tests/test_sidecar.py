"""Develop-parameter sidecars: fitted CA models + WB persisted and re-applied.

SURVEY.md §5 checkpoint/resume row ("persist fitted lens models") — the
stateless-develop analog of checkpointing: fit once, apply everywhere.
"""
import json

import numpy as np
import pytest

from pysp_tpu.correct.ca.models import (
    Poly3CorrectionModel,
    Poly5CorrectionModel,
    PtLensCorrectionModel,
)
from pysp_tpu.utils.sidecar import (
    ca_model_from_dict,
    ca_model_to_dict,
    load_sidecar,
    save_sidecar,
)


@pytest.mark.parametrize(
    "model",
    [
        Poly3CorrectionModel(0.012),
        # NEGATIVE k1: real CA fits routinely produce it (one of R/B scales
        # below G). The reference constructor clamped it to 0, which silently
        # zeroed the correction through a sidecar round trip — the clamp is
        # now the model's monotonicity domain (DIVERGENCES.md).
        Poly3CorrectionModel(-0.006),
        Poly5CorrectionModel(0.01, -0.004),
        PtLensCorrectionModel(0.008, -0.015, 0.01),
    ],
)
def test_ca_model_round_trip(model):
    d = ca_model_to_dict(model)
    back = ca_model_from_dict(d)
    assert type(back) is type(model)
    np.testing.assert_allclose(
        back.get_coefficients(), model.get_coefficients(), atol=1e-12
    )


def test_poly3_negative_k1_survives_constructor():
    """The fitters' negative k1 must survive re-construction (the sidecar
    replay path); the model stays monotonic/invertible on [0, 1]."""
    import jax.numpy as jnp

    m = Poly3CorrectionModel(-0.006)
    assert float(m.get_coefficients()[0]) == -0.006
    r = jnp.linspace(0.05, 1.0, 64)
    rd = m.get_distorted(r)
    assert bool((np.diff(np.asarray(rd)) > 0).all())  # monotonic
    back = np.asarray(m.estimate_undistorted(rd))
    np.testing.assert_allclose(back, np.asarray(r), atol=1e-5)


def test_save_load_sidecar(tmp_path):
    p = str(tmp_path / "shot.json")
    doc = save_sidecar(
        p,
        ca_model_r=Poly3CorrectionModel(0.01),
        ca_model_b=PtLensCorrectionModel(0.002, -0.004, 0.006),
        wb_neutral=np.array([0.45, 1.0, 0.62]),
        temperature=5200.0,
        extra={"note": "unit test"},
    )
    assert doc["pysp_tpu_sidecar"] == 1
    loaded = load_sidecar(p)
    assert isinstance(loaded["ca_model_r"], Poly3CorrectionModel)
    assert isinstance(loaded["ca_model_b"], PtLensCorrectionModel)
    np.testing.assert_allclose(loaded["wb_neutral"], [0.45, 1.0, 0.62])
    assert loaded["temperature_k"] == 5200.0
    assert loaded["extra"] == {"note": "unit test"}
    # human-diffable: plain JSON on disk
    raw = json.loads(open(p).read())
    assert raw["ca"]["model_r"]["type"] == "Poly3"


def test_load_rejects_foreign_json(tmp_path):
    p = tmp_path / "not_ours.json"
    p.write_text('{"some": "doc"}')
    with pytest.raises(ValueError, match="sidecar"):
        load_sidecar(str(p))


def test_cli_params_applies_saved_ca_and_wb(tmp_path, capsys):
    """--params applies saved CA coefficients + WB without re-fitting; the
    output matches applying the same models through the library directly."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from pysp_tpu import DevelopConfig, QualityDemosaic, develop, load_raw
    from pysp_tpu.cli import main
    from pysp_tpu.correct.ca.removal import remove_ca_from_raw
    from pysp_tpu.io.tiff import write_synthetic_dng

    rng = np.random.default_rng(17)
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    scene = 0.3 + 0.3 * np.sin(xx / 9.0) * np.cos(yy / 7.0) + 0.1 * rng.random((h, w))
    u16 = np.clip(scene * 3600 + 260, 0, 4095).astype(np.uint16)
    src = str(tmp_path / "shot.dng")
    with open(src, "wb") as f:
        f.write(write_synthetic_dng(u16))

    params = str(tmp_path / "shot.json")
    model_r = Poly3CorrectionModel(0.01)
    model_b = Poly3CorrectionModel(-0.006)
    wb = np.array([0.48, 1.0, 0.66])
    save_sidecar(params, ca_model_r=model_r, ca_model_b=model_b, wb_neutral=wb)

    out = str(tmp_path / "out.png")
    rc = main(["develop", src, "-o", out, "--quality", "fast", "--params", params])
    assert rc == 0
    got = np.asarray(Image.open(out), np.float64)

    frame = load_raw(src)
    frame = frame.replace(wb_neutral=jnp.asarray(wb, jnp.float32))
    frame = remove_ca_from_raw(frame, model_r, model_b)
    want = np.asarray(
        develop(frame, DevelopConfig(quality=QualityDemosaic.Fast))
    )
    want8 = np.clip(np.round(want * 255.0), 0, 255)
    assert np.abs(got - want8).max() <= 1.0  # 8-bit rounding only


def test_cli_save_params_round_trip(tmp_path):
    """--ca gradient --save-params writes a sidecar whose models reproduce the
    fitted develop bit-for-bit through --params."""
    from PIL import Image

    from pysp_tpu.cli import main
    from pysp_tpu.io.tiff import write_synthetic_dng

    rng = np.random.default_rng(19)
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    scene = 0.3 + 0.25 * np.sin(xx / 8.0) + 0.2 * (yy > h / 2) + 0.05 * rng.random((h, w))
    u16 = np.clip(scene * 3600 + 260, 0, 4095).astype(np.uint16)
    src = str(tmp_path / "shot.dng")
    with open(src, "wb") as f:
        f.write(write_synthetic_dng(u16))

    params = str(tmp_path / "fit.json")
    out1 = str(tmp_path / "fit.png")
    rc = main([
        "develop", src, "-o", out1, "--quality", "draft",
        "--ca", "gradient", "--save-params", params,
    ])
    assert rc == 0
    saved = load_sidecar(params)
    assert saved["ca_model_r"] is not None and saved["ca_model_b"] is not None

    out2 = str(tmp_path / "replay.png")
    rc = main(["develop", src, "-o", out2, "--quality", "draft", "--params", params])
    assert rc == 0
    a = np.asarray(Image.open(out1))
    b = np.asarray(Image.open(out2))
    np.testing.assert_array_equal(a, b)
