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
