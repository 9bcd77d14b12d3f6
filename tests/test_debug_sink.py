"""Debug PGM side-output (K3 analog)."""

import glob
import os

import numpy as np

from wine_label_ocr_ray.stages.debug_sink import write_pgm


def test_write_pgm_roundtrip(tmp_path):
    img = np.arange(120, dtype=np.uint8).reshape(10, 12)
    p = str(tmp_path / "x.pgm")
    write_pgm(p, img)
    raw = open(p, "rb").read()
    assert raw.startswith(b"P5\n12 10\n255\n")
    body = raw.split(b"255\n", 1)[1]
    assert np.frombuffer(body, dtype=np.uint8).reshape(10, 12).tolist() == \
        img.tolist()


def test_pipeline_debug_out(ray_session, tmp_path):
    from wine_label_ocr_ray.config import PipelineConfig
    from wine_label_ocr_ray.pipelines.extract import build_extract_pipeline
    from wine_label_ocr_ray.synth import generate_corpus
    corpus = str(tmp_path / "c")
    generate_corpus(corpus, num_docs=40, seed=11)
    dbg = str(tmp_path / "dbg")
    cfg = PipelineConfig(debug_out=dbg)
    n = build_extract_pipeline(corpus, cfg).count()
    assert n == 40
    pgms = glob.glob(os.path.join(dbg, "*.pgm"))
    assert len(pgms) > 0
    assert open(pgms[0], "rb").read(2) == b"P5"
