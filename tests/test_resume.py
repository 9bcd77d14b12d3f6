"""Checkpoint/resume: kill after k partitions, restart, assert the
final table equals a clean run with no duplicated or recomputed
partitions (SURVEY.md section 5.2)."""

import glob
import os

import pyarrow.dataset as pads
import pytest

from wine_label_ocr_ray.stages.checkpoint import (committed_partitions,
                                                  run_checkpointed)
from wine_label_ocr_ray.synth import generate_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt") / "corpus")
    # 4 shards so the fail-after-2 test is meaningful
    generate_corpus(out, num_docs=400, seed=7, num_shards=4)
    return out


def _read_sorted(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    t = pads.dataset(files).to_table()
    return t.sort_by("doc_id")


def test_crash_then_resume_equals_clean_run(ray_session, corpus, tmp_path):
    crash_dir = str(tmp_path / "crash_out")
    clean_dir = str(tmp_path / "clean_out")

    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(corpus, crash_dir, fail_after=2)
    committed = committed_partitions(crash_dir)
    assert len(committed) == 2

    # record commit mtimes to prove the resume does not recompute them
    mtimes = {name: os.path.getmtime(
        os.path.join(crash_dir, "_manifests", f"{name}.json"))
        for name in committed}

    summary = run_checkpointed(corpus, crash_dir)
    assert summary["executed"] == 2 and summary["skipped"] == 2
    for name, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(
            crash_dir, "_manifests", f"{name}.json")) == mt

    clean = run_checkpointed(corpus, clean_dir)
    assert clean["executed"] == 4 and clean["skipped"] == 0

    t_resumed = _read_sorted(crash_dir)
    t_clean = _read_sorted(clean_dir)
    assert t_resumed.num_rows == t_clean.num_rows == 400
    assert t_resumed.equals(t_clean)


def test_manifest_metrics(ray_session, corpus, tmp_path):
    out = str(tmp_path / "m_out")
    summary = run_checkpointed(corpus, out)
    m = summary["metrics"]
    assert m["rows"] == 400
    assert 0 < m["valid"] <= 400
    assert m["vintage_found"] > 100
    assert m["maker_found"] > 100
    for manifest in committed_partitions(out).values():
        assert manifest["lineage"]["config_hash"]
        assert manifest["metrics"]["rows"] > 0
        assert 0.0 <= manifest["metrics"]["mean_ocr_conf"] <= 1.0


def test_lineage_mismatch_recomputes(ray_session, corpus, tmp_path):
    """Changing a semantic config knob invalidates committed
    partitions (config hash is part of lineage)."""
    from wine_label_ocr_ray.config import PipelineConfig
    out = str(tmp_path / "l_out")
    run_checkpointed(corpus, out)
    summary = run_checkpointed(corpus, out,
                               PipelineConfig(confidence_threshold=0.5))
    assert summary["executed"] == 4 and summary["skipped"] == 0


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt_small") / "corpus")
    generate_corpus(out, num_docs=80, seed=11, num_shards=2)
    return out


def test_regroup_purges_stale_partitions(ray_session, small_corpus,
                                         tmp_path):
    """Re-execution under a DIFFERENT group_size (so the same shards
    commit under a new unit name) must purge the stale unit's part dir
    and manifest — otherwise part=*/ globs return duplicated rows."""
    from wine_label_ocr_ray.config import PipelineConfig
    out = str(tmp_path / "regroup_out")
    run_checkpointed(small_corpus, out, group_size=2)
    assert len(committed_partitions(out)) == 1  # one 2-shard group

    # config change invalidates lineage; resume regroups to 1 shard/unit
    summary = run_checkpointed(
        small_corpus, out, PipelineConfig(confidence_threshold=0.5),
        group_size=1)
    assert summary["executed"] == 2 and summary["skipped"] == 0

    t = _read_sorted(out)
    assert t.num_rows == summary["metrics"]["rows"] == 80
    # the stale grouped unit is gone entirely
    names = set(committed_partitions(out))
    assert not any("__" in n for n in names) and len(names) == 2
    assert not glob.glob(os.path.join(out, "part=*__*"))


def test_resume_survives_deleted_input_shard(ray_session, tmp_path):
    """A manifest listing a since-deleted input shard must be treated
    as a lineage mismatch (partition re-executes), not crash the
    resume scan with FileNotFoundError."""
    corpus2 = str(tmp_path / "corpus2")
    generate_corpus(corpus2, num_docs=80, seed=13, num_shards=2)
    out = str(tmp_path / "del_out")
    run_checkpointed(corpus2, out)

    # regenerate the corpus under new shard names: old manifests now
    # reference files that no longer exist
    import shutil
    shutil.rmtree(corpus2)
    generate_corpus(corpus2, num_docs=80, seed=13, num_shards=1)
    summary = run_checkpointed(corpus2, out)  # must not raise
    assert summary["executed"] == 1 and summary["skipped"] == 0
    assert _read_sorted(out).num_rows == 80


def test_config_hash_default_backcompat():
    """Manifests written before the engines/sweep_max_variants lineage
    keys existed must keep matching under a default config: the hash
    of a default PipelineConfig omits the new keys entirely."""
    import hashlib
    import json
    from dataclasses import asdict
    from wine_label_ocr_ray.config import PipelineConfig
    from wine_label_ocr_ray.stages.checkpoint import (_SEMANTIC_KEYS,
                                                      _config_hash)
    cfg = PipelineConfig()
    d = asdict(cfg)
    legacy = hashlib.sha1(json.dumps(
        {k: d[k] for k in _SEMANTIC_KEYS}, sort_keys=True,
        default=str).encode()).hexdigest()[:12]
    assert _config_hash(cfg) == legacy
    # non-default engine/sweep DO change the hash
    assert _config_hash(PipelineConfig(sweep_max_variants=10)) != legacy
    assert _config_hash(PipelineConfig(engines="other")) != legacy


def test_grouped_commit_equals_sequential(ray_session, corpus, tmp_path):
    """group_size=2 runs 2 shards per pipeline execution (amortized
    actor-pool ramp) with identical final rows; resume after a group
    crash re-executes only the missing group."""
    g_dir = str(tmp_path / "group_out")
    s_dir = str(tmp_path / "seq_out")

    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(corpus, g_dir, fail_after=1, group_size=2)
    assert len(committed_partitions(g_dir)) == 1  # one 2-shard group

    summary = run_checkpointed(corpus, g_dir, group_size=2)
    assert summary["executed"] == 1 and summary["skipped"] == 1

    seq = run_checkpointed(corpus, s_dir)
    assert seq["executed"] == 4

    t_group = _read_sorted(g_dir)
    t_seq = _read_sorted(s_dir)
    assert t_group.num_rows == t_seq.num_rows == 400
    assert t_group.equals(t_seq)


def test_transitional_config_hash_accepted():
    """Manifests written by the transitional version (which always
    included engines/sweep_max_variants in the hash payload) must
    still match under the default config — a resume after upgrade
    must not re-execute every committed partition."""
    from wine_label_ocr_ray.config import PipelineConfig
    from wine_label_ocr_ray.stages.checkpoint import (
        _accepted_config_hashes, _config_hash, _lineage,
        _lineage_matches)
    cfg = PipelineConfig()
    canonical = _config_hash(cfg)
    legacy = _config_hash(cfg, legacy_always_include=True)
    assert canonical != legacy
    assert _accepted_config_hashes(cfg) == {canonical, legacy}
    import tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".parquet",
                                     delete=False) as f:
        f.write(b"x" * 10)
        path = f.name
    try:
        lin = _lineage([path], cfg)
        legacy_lin = dict(lin, config_hash=legacy)
        assert _lineage_matches([path], cfg, lin)
        assert _lineage_matches([path], cfg, legacy_lin)
        assert not _lineage_matches([path], cfg,
                                    dict(lin, config_hash="deadbeef"))
        # non-default config: neither form of the DEFAULT hash matches
        other = PipelineConfig(sweep_max_variants=10)
        assert not _lineage_matches([path], other, lin)
    finally:
        os.unlink(path)


def test_schema_fingerprint_change_forces_reexecution(ray_session, corpus,
                                                      tmp_path):
    """VERDICT r4 item 3 + ADVICE r4: a partition committed under a
    DIFFERENT record schema (e.g. the pre-r5 names-only fingerprint,
    or any type-only change) must re-execute on resume instead of
    mixing incompatible partitions."""
    import json

    out = str(tmp_path / "schema_out")
    run_checkpointed(corpus, out)
    manifests = sorted(glob.glob(os.path.join(out, "_manifests", "*.json")))
    assert manifests
    # simulate one partition committed under the old names-only schema
    with open(manifests[0]) as f:
        m = json.load(f)
    assert ":" in m["lineage"]["schema"]  # fingerprint carries types
    m["lineage"]["schema"] = "|".join(
        part.split(":", 1)[0] for part in m["lineage"]["schema"].split("|"))
    with open(manifests[0], "w") as f:
        json.dump(m, f)

    summary = run_checkpointed(corpus, out)
    assert summary["executed"] == 1 and summary["skipped"] == 3


def test_auto_group_size_output_identical_to_per_shard(ray_session, corpus,
                                                       tmp_path):
    """VERDICT r4 item 6: group_size='auto' calibrates on the first
    shard, groups the rest so the ~8.8 s fixed cost stays <10% of a
    group's predicted compute, and produces byte-identical output to
    the per-shard run."""
    auto_dir = str(tmp_path / "auto_out")
    per_dir = str(tmp_path / "per_out")
    summary = run_checkpointed(corpus, auto_dir, group_size="auto")
    g = summary["auto_group_size"]
    assert g >= 1
    # tiny test shards => compute << fixed cost => groups go wide
    # (bounded by remaining shard count here, AUTO_GROUP_MAX generally)
    assert g == 3  # 4 shards: 1 calibration + 1 group of the rest
    assert summary["executed"] == 2 and summary["partitions"] == 2
    clean = run_checkpointed(corpus, per_dir, group_size=1)
    assert clean["executed"] == 4
    t_auto = _read_sorted(auto_dir)
    t_per = _read_sorted(per_dir)
    assert t_auto.num_rows == t_per.num_rows == 400
    assert t_auto.equals(t_per)
    # resume of the auto run skips everything (lineage intact)
    again = run_checkpointed(corpus, auto_dir, group_size="auto")
    assert again["executed"] == 0 and again["skipped"] == 2


def test_pre_schema_manifest_rejected():
    """A manifest from before schema tracking (no 'schema' key) can no
    longer match: the record schema has changed since that era (typed
    raw/blob), so those partitions must re-execute, not mix."""
    import os
    import tempfile

    from wine_label_ocr_ray.config import PipelineConfig
    from wine_label_ocr_ray.stages.checkpoint import (_lineage,
                                                      _lineage_matches)
    cfg = PipelineConfig()
    with tempfile.NamedTemporaryFile(suffix=".parquet", delete=False) as f:
        f.write(b"x" * 10)
        path = f.name
    try:
        lin = _lineage([path], cfg)
        assert _lineage_matches([path], cfg, lin)
        legacy = {k: v for k, v in lin.items() if k != "schema"}
        assert not _lineage_matches([path], cfg, legacy)
    finally:
        os.unlink(path)
