"""Regenerate tests/fixtures/rows_only_hashes.json — the committed
self-consistency fingerprints for every query WITHOUT a DuckDB oracle
(VERDICT r4 item 5). Run after an INTENTIONAL semantics change:

    python tests/regen_rows_only_hashes.py

and commit the diff (the diff IS the review surface: an unexplained
hash change in an unrelated PR is a regression)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT = os.path.join(os.path.dirname(__file__), "fixtures",
                   "rows_only_hashes.json")


def main() -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    from wine_label_ocr_ray.pipelines._qutil import result_fingerprint
    from wine_label_ocr_ray.pipelines.queries import ORACLE_SQL, QUERIES

    rows_only = sorted(n for n in QUERIES if n not in ORACLE_SQL)
    out = {}
    for sf_dir in SF_DIRS:
        tag = os.path.basename(sf_dir)
        out[tag] = {}
        for name in rows_only:
            out[tag][name] = result_fingerprint(QUERIES[name](sf_dir))
            print(f"{tag}/{name}: {out[tag][name]}")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}")
    ray.shutdown()


if __name__ == "__main__":
    main()
