"""The maximal-pipeline example: every subsystem in one flow (examples/full_pipeline.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_full_pipeline(tmp_path):
    from full_pipeline import main

    out = main(str(tmp_path))
    assert os.path.exists(out)

    from PIL import Image

    img = Image.open(out)
    assert img.size == (256, 256)


def test_burst_production_example(tmp_path, monkeypatch):
    """The round-4 production workflow example runs end to end on the virtual
    mesh: sidecar fit on frame 0, burst CA + sharded develop, PNG outputs."""
    import tempfile

    import burst_production as bp

    monkeypatch.setattr(
        tempfile, "mkdtemp", lambda prefix="": str(tmp_path)
    )
    bp.main()
    pngs = [p for p in os.listdir(str(tmp_path)) if p.endswith(".png")]
    assert len(pngs) == 4
    assert os.path.exists(str(tmp_path / "burst.json"))

    from pysp_tpu.utils.sidecar import load_sidecar

    params = load_sidecar(str(tmp_path / "burst.json"))
    # the fit recovers a correcting model of the baked aberration's sign and
    # scale (bake k1 = -0.012; double resampling attenuates ~30%)
    k1_r = float(params["ca_model_r"].get_coefficients()[0])
    assert -0.03 < k1_r < -0.003, k1_r
