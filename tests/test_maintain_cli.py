"""Maintenance CLI end-to-end: init → merge → compact over real parquet,
audit JSON on stdout, final state equals the dict upsert."""

from __future__ import annotations

import json
import subprocess
import sys

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _run(*argv: str) -> dict:
    r = subprocess.run(
        [sys.executable, "-m", "mimic2ts_spark.maintain", *argv],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_maintain_init_merge_compact_roundtrip(spark, tmp_path):
    """The `--inplace` fast path (merge.py layout): auto-routing must
    keep existing in-place tables working flag-free on merge/compact."""
    base_dir = str(tmp_path / "base")
    upd_dir = str(tmp_path / "updates")

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.where(F.col("doc_id") % 7 == 0).withColumn(
        "text", F.lit("updated")
    ).write.parquet(upd_dir)

    a1 = _run("init", base_dir, f"{SF}/documents.parquet", "--buckets", "8",
              "--inplace")
    assert a1["backend"] == "inplace"
    assert a1["n_rows"] == docs.count()

    a2 = _run("merge", base_dir, upd_dir, "--buckets", "8")
    assert a2["n_updates"] == docs.where(F.col("doc_id") % 7 == 0).count()
    assert 1 <= len(a2["affected_buckets"]) <= 8

    a3 = _run("compact", base_dir)
    assert a3["files_after"] <= a3["files_before"]
    assert a3["files_after"] == 8  # one file per bucket

    final = spark.read.parquet(base_dir)
    assert final.count() == docs.count()
    n_upd = final.where(F.col("text") == "updated").count()
    assert n_upd == a2["n_updates"]


def test_maintain_versioned_default_and_crash_window(spark, tmp_path):
    """Default (no --inplace) init/merge/compact route through the
    versioned backend: every merge COMMITS a manifest version (the r05
    verdict's routing ask), and a crash that died after writing v2 data
    + manifest but BEFORE the pointer flip leaves readers on v1 and the
    next CLI merge re-commits cleanly over the debris."""
    import os
    import shutil

    from mimic2ts_spark.operators.versioned import latest_version, read_table

    base_dir = str(tmp_path / "vbase")
    upd_dir = str(tmp_path / "vupd")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.where(F.col("doc_id") % 7 == 0).withColumn(
        "text", F.lit("updated")
    ).write.parquet(upd_dir)

    a1 = _run("init", base_dir, f"{SF}/documents.parquet", "--buckets", "8")
    assert a1["backend"] == "versioned" and a1["version"] == 0
    assert a1["n_rows"] == docs.count()

    a2 = _run("merge", base_dir, upd_dir)
    assert a2["backend"] == "versioned" and a2["version"] == 1
    assert a2["n_updates"] == docs.where(F.col("doc_id") % 7 == 0).count()
    got = read_table(spark, base_dir)
    assert got.count() == docs.count()
    assert got.where(F.col("text") == "updated").count() == a2["n_updates"]

    # simulate the crash window: v2 data dir + manifest exist, pointer
    # still names v1 (data-first/manifest-second/pointer-last ordering)
    shutil.copytree(os.path.join(base_dir, "v1"), os.path.join(base_dir, "v2"))
    shutil.copy(
        os.path.join(base_dir, "_versions", "1.json"),
        os.path.join(base_dir, "_versions", "2.json"),
    )
    assert latest_version(base_dir) == 1  # readers undisturbed
    assert read_table(spark, base_dir).count() == docs.count()

    a3 = _run("merge", base_dir, upd_dir)  # re-commits over the debris
    assert a3["version"] == 2 and latest_version(base_dir) == 2
    assert read_table(spark, base_dir).count() == docs.count()

    a4 = _run("compact", base_dir)
    assert a4["backend"] == "versioned" and a4["version"] == 3
    assert read_table(spark, base_dir).count() == docs.count()


def test_maintain_vacuum_cli(spark, tmp_path, capsys):
    """`vacuum` over a versioned table: keeps the newest K manifests,
    reports deletions, needs no Spark session (driver-side FS walk)."""
    from pyspark.sql import functions as F

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.versioned import (
        init_table,
        merge_versioned,
        read_table,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "vt")
    init_table(docs, path, "doc_id", n_buckets=4)
    for k in (1, 2, 3):
        upd = docs.where(F.col("doc_id") == k).withColumn("text", F.lit(f"u{k}"))
        merge_versioned(spark, path, upd, "doc_id")

    main(["vacuum", path, "--keep-versions", "2"])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "vacuum"
    assert audit["retained_versions"] == [2, 3]
    assert audit["manifests_deleted"] == 2
    assert read_table(spark, path).count() == docs.count()


def test_maintain_cluster_artifact(spark, tmp_path, capsys):
    """`cluster` persists the near-dup (doc_id, cluster_id) labeling as
    a parquet artifact (the r05-verdict artifact-sharing pattern made
    durable): the persisted labels must equal the registry query's
    labeling exactly, and the audit counts must agree with them."""
    from mimic2ts_spark.harness_ext import q_dedup_clusters
    from mimic2ts_spark.maintain import main

    out = str(tmp_path / "labels")
    main(["cluster", out, f"{SF}/documents.parquet"])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "cluster"

    persisted = {
        r["doc_id"]: r["cluster_id"] for r in spark.read.parquet(out).collect()
    }
    live = {
        r["doc_id"]: r["cluster_id"] for r in q_dedup_clusters(spark, SF).collect()
    }
    assert persisted == live
    assert audit["n_docs"] == len(persisted)
    assert audit["n_clusters"] == len(set(persisted.values()))
    assert audit["n_duplicates"] == audit["n_docs"] - audit["n_clusters"]


def test_maintain_classifier_weights_artifact(spark, tmp_path, capsys):
    """`classifier-weights` persists the DENSE (bucket, w) model table
    (X208): every bucket has a row (an absent bucket would silently
    drop its tokens from every score through the apply join), weights
    are within the stand-in range, and scores served FROM the artifact
    bit-equal the derived apply path."""
    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.text import CLS_DIM, classifier_scores

    out = str(tmp_path / "cls_w")
    main(["classifier-weights", out])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "classifier-weights" and audit["dim"] == CLS_DIM

    w = spark.read.parquet(out)
    rows = w.collect()
    assert len(rows) == CLS_DIM
    assert {r.bucket for r in rows} == set(range(CLS_DIM))
    assert all(-100 <= r.w <= 100 for r in rows)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    served = {r.doc_id: tuple(r) for r in classifier_scores(docs, weights=w).collect()}
    derived = {r.doc_id: tuple(r) for r in classifier_scores(docs).collect()}
    assert served == derived


def test_maintain_codebook_artifact(spark, tmp_path, capsys):
    """`codebook` trains + persists PQ codebooks; encoding against the
    artifact bit-equals retraining (in-process: get_spark reuses the
    session, so this costs no extra JVM)."""
    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.pq import PQ_M, load_codebooks, pq_encode

    out = str(tmp_path / "cb.json")
    main(["codebook", out, f"{SF}/embeddings.parquet"])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "codebook" and audit["m"] == PQ_M

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    via = {r["vec_id"]: tuple(r) for r in
           pq_encode(vecs, codebooks=load_codebooks(out)).collect()}
    fresh = {r["vec_id"]: tuple(r) for r in pq_encode(vecs).collect()}
    assert via == fresh


def test_maintain_sq8_stats_artifact(spark, tmp_path, capsys):
    """`sq8-stats` persists the serving quantizer state (per-dim int
    lo/hi); SQ8 serving against the artifact bit-equals the derived
    run (deterministic stats ⇒ identical codes, decodes, distances),
    and a quant-grid mismatch is rejected on load."""
    import pytest
    from pyspark.sql import functions as F

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.pq import load_sq8_stats, sq8_l2_panel

    out = str(tmp_path / "sq8.json")
    main(["sq8-stats", out, f"{SF}/embeddings.parquet"])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "sq8-stats" and audit["n_dims"] == 64

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = vecs.where(F.col("vec_id") < 4)
    served = {
        (r["query_id"], r["neighbor_id"]): r["d2"]
        for r in sq8_l2_panel(vecs, qs, k=5, stats=load_sq8_stats(out)).collect()
    }
    fresh = {
        (r["query_id"], r["neighbor_id"]): r["d2"]
        for r in sq8_l2_panel(vecs, qs, k=5).collect()
    }
    assert served == fresh and served

    bad = json.load(open(out))
    bad["quant"] = 1 << 10
    json.dump(bad, open(out, "w"))
    with pytest.raises(ValueError, match="quant grid"):
        load_sq8_stats(out)


def test_maintain_bq_codes_artifact(spark, tmp_path, capsys):
    """`bq-codes` persists the packed sign sketch (8 bytes/vector);
    artifact-served Hamming top-k AND the two-stage rescored form both
    bit-equal the scan forms (shared cores + deterministic pack), and
    the meta records the dimensionality contract."""
    from pyspark.sql import functions as F

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.pq import (
        bq_hamming_panel,
        bq_rescore_panel,
        serve_bq_artifact,
    )

    out = str(tmp_path / "bq")
    main(["bq-codes", out, f"{SF}/embeddings.parquet"])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "bq-codes"
    assert audit["dim"] == 64 and audit["lanes"] == 2 and audit["n"] > 0

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = vecs.where(F.col("vec_id") < 4)
    served = {
        tuple(r)
        for r in serve_bq_artifact(spark, out, qs, k=5).collect()
    }
    fresh = {tuple(r) for r in bq_hamming_panel(vecs, qs, k=5).collect()}
    assert served == fresh and served

    served_r = {
        tuple(r)
        for r in serve_bq_artifact(spark, out, qs, k=5, src=vecs).collect()
    }
    fresh_r = {tuple(r) for r in bq_rescore_panel(vecs, qs, k=5).collect()}
    assert served_r == fresh_r and served_r


def test_maintain_bq_codes_append_equals_rebuild(spark, tmp_path, capsys):
    """`bq-codes-append` inserts a NEW-ids delta at O(delta) cost and —
    because the sign pack is ROW-LOCAL — the appended index serves
    BIT-EQUAL to a from-scratch rebuild over the grown corpus (the
    strong form the knn-graph append can only approximate)."""
    from pyspark.sql import functions as F

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.pq import serve_bq_artifact

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = vecs.where(F.col("vec_id") % 2 == 0)
    delta = vecs.where(F.col("vec_id") % 2 == 1)
    bdir, ddir = str(tmp_path / "b.parquet"), str(tmp_path / "d.parquet")
    base.write.parquet(bdir)
    delta.write.parquet(ddir)

    grown = str(tmp_path / "bq_grown")
    main(["bq-codes", grown, bdir])
    main(["bq-codes-append", grown, ddir])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "bq-codes-append"
    assert audit["n"] == vecs.count() and audit["delta"] == delta.count()

    rebuilt = str(tmp_path / "bq_rebuilt")
    main(["bq-codes", rebuilt, f"{SF}/embeddings.parquet"])

    qs = vecs.where(F.col("vec_id") < 4)
    a = {tuple(r) for r in serve_bq_artifact(spark, grown, qs, k=5).collect()}
    b = {tuple(r) for r in serve_bq_artifact(spark, rebuilt, qs, k=5).collect()}
    assert a == b and a


def test_maintain_codes_compact_bq_and_sq8(spark, tmp_path, capsys):
    """X229: `codes-compact` rewrites a fragmented FLAT codes artifact
    dir (appends add one file per batch) to one vec_id-sorted file via
    the crash-safe sibling-staged swap — serving bit-equal before and
    after, for ALL THREE flat-codes artifacts (BQ X218, SQ8 X226,
    PQ X230); a second run is a no-op, and an interrupted swap (live
    dir missing, aside present) recovers."""
    import os as _os

    from pyspark.sql import functions as F

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.pq import (
        serve_bq_artifact,
        serve_sq8_artifact,
    )

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    parts = [vecs.where(F.col("vec_id") % 3 == i) for i in range(3)]
    paths = []
    for i, df in enumerate(parts):
        p = str(tmp_path / f"p{i}.parquet")
        df.write.parquet(p)
        paths.append(p)
    qs = vecs.where(F.col("vec_id") < 4)

    def _n_files(d):
        return len([e for e in _os.listdir(d)
                    if e.endswith(".parquet") and not e.startswith(("_", "."))])

    from mimic2ts_spark.operators.pq import serve_pq_artifact

    for kind, serve in (
        ("bq", serve_bq_artifact),
        ("sq8", serve_sq8_artifact),
        ("pq", serve_pq_artifact),
    ):
        out = str(tmp_path / kind)
        main([f"{kind}-codes", out, paths[0]])
        main([f"{kind}-codes-append", out, paths[1]])
        main([f"{kind}-codes-append", out, paths[2]])
        capsys.readouterr()
        codes = _os.path.join(out, "codes")
        assert _n_files(codes) > 1
        before = sorted(
            tuple(r) for r in serve(spark, out, qs, 5).collect()
        )
        main(["codes-compact", out])
        audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert audit["compacted"] is True and audit["files_after"] == 1
        assert _n_files(codes) == 1
        after = sorted(tuple(r) for r in serve(spark, out, qs, 5).collect())
        assert after == before and after
        # second run: no-op
        main(["codes-compact", out])
        audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert audit["compacted"] is False

        # interrupted-swap recovery: aside present, live dir gone
        _os.rename(codes, codes + "._old")
        main(["codes-compact", out])
        capsys.readouterr()
        assert _os.path.isdir(codes) and not _os.path.isdir(codes + "._old")
        recovered = sorted(
            tuple(r) for r in serve(spark, out, qs, 5).collect()
        )
        assert recovered == before


def test_maintain_ivfpq_codes_build_append_compact(spark, tmp_path, capsys):
    """X231: `ivfpq-codes` persists the Faiss IVFADC layout (coarse
    centroids JSON + frozen residual codebooks + cid-PARTITIONED 4-int
    codes). Pins: (a) artifact-served panel top-k bit-equals the
    scan-form ivfpq_topk_panel on the same corpus (shared tie
    discipline); (b) `ivfpq-codes-append` grows it at O(delta) under
    the FROZEN state and the grown index serves bit-equal to a one-shot
    encode of the full corpus under the SAME state; (c) a replayed
    delta appends nothing; (d) `ivfpq-compact` rewrites fragmented
    cells via the crash-safe per-cell swap, serving bit-equal before
    and after."""
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.pq import (
        IVFPQ_META,
        _ivfpq_encode_under,
        _ivfpq_state,
        _quant_base,
        _write_codes_meta,
        append_ivfpq_artifact,
        ivfpq_topk_panel,
        serve_ivfpq_artifact,
    )

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = vecs.where(F.col("vec_id") % 2 == 0)
    delta = vecs.where(F.col("vec_id") % 2 == 1)
    bdir, ddir = str(tmp_path / "b.parquet"), str(tmp_path / "d.parquet")
    base.write.parquet(bdir)
    delta.write.parquet(ddir)
    qs = vecs.where(F.col("vec_id") < 4)

    # (a) build on the FULL corpus → served == scan panel
    out_full = str(tmp_path / "ivfpq_full")
    main(["ivfpq-codes", out_full, f"{SF}/embeddings.parquet"])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "ivfpq-codes" and audit["n"] == vecs.count()
    got = sorted(
        (r.query_id, r.neighbor_id, r.adc_dist2)
        for r in serve_ivfpq_artifact(spark, out_full, qs, 5).collect()
    )
    want = sorted(
        tuple(r) for r in ivfpq_topk_panel(vecs, qs, 5).collect()
    )
    assert got == want and got
    # codes are cid-partitioned on disk (the partition-filter story)
    cells = [e for e in _os.listdir(_os.path.join(out_full, "codes"))
             if e.startswith("cid=")]
    assert len(cells) > 1

    # (b)+(c) grow a base-trained artifact; frozen-state equality
    out = str(tmp_path / "ivfpq_grow")
    main(["ivfpq-codes", out, bdir])
    main(["ivfpq-codes-append", out, ddir])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "ivfpq-codes-append"
    assert audit["n"] == vecs.count() and audit["delta"] == delta.count()
    replay = append_ivfpq_artifact(spark, out, delta.unionByName(delta))
    assert replay["delta"] == 0 and replay["n"] == vecs.count()

    # reference: one-shot encode of the FULL corpus under the SAME
    # base-trained state (copy JSONs, rewrite codes in one pass)
    ref = str(tmp_path / "ivfpq_ref")
    _os.makedirs(ref)
    for f in ("centroids.json", "codebooks.json"):
        _shutil.copy(_os.path.join(out, f), _os.path.join(ref, f))
    coarse, books = _ivfpq_state(out)
    (
        _ivfpq_encode_under(_quant_base(vecs, "vec_id", "embedding"),
                            coarse, books)
        .write.partitionBy("cid").parquet(_os.path.join(ref, "codes"))
    )
    _write_codes_meta(ref, IVFPQ_META, {"n": vecs.count()})
    a = sorted(tuple(r)
               for r in serve_ivfpq_artifact(spark, out, qs, 5).collect())
    b = sorted(tuple(r)
               for r in serve_ivfpq_artifact(spark, ref, qs, 5).collect())
    assert a == b and a

    # (d) fragmentation + compaction: the grown index has ≥2 files in
    # touched cells; compact to 1 per cell, serving unchanged
    codes_dir = _os.path.join(out, "codes")

    def _max_files_per_cell():
        mx = 0
        for cell in _os.listdir(codes_dir):
            if not cell.startswith("cid="):
                continue
            n = len([e for e in _os.listdir(_os.path.join(codes_dir, cell))
                     if e.endswith(".parquet")
                     and not e.startswith(("_", "."))])
            mx = max(mx, n)
        return mx

    assert _max_files_per_cell() > 1
    main(["ivfpq-compact", out])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "ivfpq-compact" and audit["cells_compacted"] >= 1
    assert _max_files_per_cell() == 1
    after = sorted(tuple(r)
                   for r in serve_ivfpq_artifact(spark, out, qs, 5).collect())
    assert after == a


def test_append_meta_crash_reconcile(spark, tmp_path):
    """VERDICT r13 #4: the codes-append audit `n` is CRASH-CONSISTENT.
    Appends write the meta first with a pending_delta marker, append,
    then clear it — so both kill windows (marker written / append not
    landed, and append landed / final meta write killed) leave a marker
    behind, and the next meta load reconciles `n` from one cheap count
    of the stored codes. Pinned for all three flat-codes artifacts,
    plus the idempotent-reappend path after a heal."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from mimic2ts_spark.operators.pq import (
        BQ_META,
        PQ_CODES_META,
        SQ8_META,
        _load_codes_meta_reconciled,
        append_bq_artifact,
        append_pq_artifact,
        append_sq8_artifact,
        build_bq_artifact,
        build_pq_artifact,
        build_sq8_artifact,
    )

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = vecs.where(F.col("vec_id") % 2 == 0)
    delta = vecs.where(F.col("vec_id") % 2 == 1)
    n_base, n_all = base.count(), vecs.count()

    from mimic2ts_spark.operators.pq import (
        IVFPQ_META,
        append_ivfpq_artifact,
        build_ivfpq_artifact,
    )

    for kind, build, append, meta_file in (
        ("bq", build_bq_artifact, append_bq_artifact, BQ_META),
        ("sq8", build_sq8_artifact, append_sq8_artifact, SQ8_META),
        ("pq", build_pq_artifact, append_pq_artifact, PQ_CODES_META),
        ("ivfpq", build_ivfpq_artifact, append_ivfpq_artifact, IVFPQ_META),
    ):
        out = str(tmp_path / kind)
        build(spark, out, base)
        mpath = _os.path.join(out, meta_file)

        # window A: kill AFTER the marker write, BEFORE the parquet
        # append — stored codes unchanged, marker left behind
        with open(mpath) as f:
            meta = _json.load(f)
        with open(mpath, "w") as f:
            _json.dump({**meta, "pending_delta": 123}, f)
        healed = _load_codes_meta_reconciled(spark, out, meta_file)
        assert healed["n"] == n_base and "pending_delta" not in healed
        with open(mpath) as f:
            assert "pending_delta" not in _json.load(f)  # persisted heal

        # window B: kill AFTER the parquet append, BEFORE the final
        # meta write — codes grown, meta still old n + marker
        append(spark, out, delta)  # legitimate append (ends clean)
        with open(mpath) as f:
            meta = _json.load(f)
        with open(mpath, "w") as f:
            _json.dump({**meta, "n": n_base, "pending_delta": 1}, f)
        healed = _load_codes_meta_reconciled(spark, out, meta_file)
        assert healed["n"] == n_all and "pending_delta" not in healed

        # a redelivered append after a heal stays idempotent: 0 new
        # rows, audit n unchanged
        res = append(spark, out, delta)
        assert res["n"] == n_all and res["delta"] == 0


def test_compact_missing_artifact_clean_error(spark, tmp_path):
    """ADVICE r13: compaction against a never-built artifact raises a
    clear 'artifact not found' error naming the build command, not a
    raw os.listdir traceback."""
    import pytest as _pytest

    from mimic2ts_spark.operators.pq import compact_codes_dir
    from mimic2ts_spark.operators.similarity import compact_ivf_artifact

    missing = str(tmp_path / "never_built")
    with _pytest.raises(FileNotFoundError, match="artifact not found"):
        compact_codes_dir(spark, missing)
    with _pytest.raises(FileNotFoundError, match="artifact not found"):
        compact_ivf_artifact(spark, missing)


def test_maintain_pq_codes_build_and_append(spark, tmp_path, capsys):
    """`pq-codes` persists the PQ index (frozen codebooks JSON + 4-int
    codes table); artifact-served ADC bit-equals the scan-form
    pq_adc_panel; `pq-codes-append` grows it at O(delta) under the
    FROZEN books, and the grown index serves bit-equal to a one-shot
    encode under the same books (X230)."""
    from pyspark.sql import functions as F

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.pq import (
        PQ_BOOKS_FILE,
        load_codebooks,
        pq_adc_panel,
        serve_pq_artifact,
    )

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = vecs.where(F.col("vec_id") % 2 == 0)
    delta = vecs.where(F.col("vec_id") % 2 == 1)
    bdir, ddir = str(tmp_path / "b.parquet"), str(tmp_path / "d.parquet")
    base.write.parquet(bdir)
    delta.write.parquet(ddir)

    out = str(tmp_path / "pq")
    main(["pq-codes", out, bdir])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "pq-codes"
    assert audit["n"] == base.count() and audit["m"] == 4

    import os as _os

    books = load_codebooks(_os.path.join(out, PQ_BOOKS_FILE))
    qs = vecs.where(F.col("vec_id") < 4)
    served = {
        tuple(r) for r in serve_pq_artifact(spark, out, qs, 5).collect()
    }
    fresh = {
        tuple(r) for r in pq_adc_panel(base, qs, 5, codebooks=books).collect()
    }
    assert served == fresh and served

    main(["pq-codes-append", out, ddir])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "pq-codes-append"
    assert audit["n"] == vecs.count() and audit["delta"] == delta.count()

    grown = {
        tuple(r) for r in serve_pq_artifact(spark, out, qs, 5).collect()
    }
    want = {
        tuple(r) for r in pq_adc_panel(vecs, qs, 5, codebooks=books).collect()
    }
    assert grown == want and grown


def test_maintain_ivf_compact_fragmented_cells(spark, tmp_path, capsys):
    """X227: streaming/batch appends leave one parquet file per touched
    cell per batch; `ivf-compact` rewrites only the FRAGMENTED cells
    (O(fragmented cells), crash-safe per-cell rename-aside swap staged
    OUTSIDE the postings tree) — file count drops to ≤1 per cell,
    serving is bit-equal before/after, the audit sidecar is unchanged,
    and an interrupted swap (live cell missing, aside present) recovers
    on the next run."""
    import os as _os

    from pyspark.sql import functions as F

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.similarity import serve_ivf_artifact

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = vecs.where(F.col("vec_id") % 3 == 0)
    d1 = vecs.where(F.col("vec_id") % 3 == 1)
    d2 = vecs.where(F.col("vec_id") % 3 == 2)
    paths = {}
    for name, df in (("b", base), ("d1", d1), ("d2", d2)):
        paths[name] = str(tmp_path / f"{name}.parquet")
        df.write.parquet(paths[name])

    out = str(tmp_path / "ivf")
    main(["ivf", out, paths["b"]])
    main(["ivf-append", out, paths["d1"]])
    main(["ivf-append", out, paths["d2"]])
    capsys.readouterr()

    qs = vecs.where(F.col("vec_id") < 4)
    before = sorted(
        tuple(r) for r in serve_ivf_artifact(spark, out, qs, vecs, k=5).collect()
    )

    def _frag_cells():
        post = _os.path.join(out, "postings")
        frag = 0
        for cell in _os.listdir(post):
            d = _os.path.join(post, cell)
            if not cell.startswith("cid=") or not _os.path.isdir(d):
                continue
            n = len([e for e in _os.listdir(d)
                     if e.endswith(".parquet") and not e.startswith(("_", "."))])
            if n > 1:
                frag += 1
        return frag

    assert _frag_cells() > 0  # the appends actually fragmented cells
    main(["ivf-compact", out])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "ivf-compact"
    assert audit["cells_compacted"] > 0
    assert audit["files_after"] < audit["files_before"]
    assert _frag_cells() == 0

    after = sorted(
        tuple(r) for r in serve_ivf_artifact(spark, out, qs, vecs, k=5).collect()
    )
    assert after == before and after

    # interrupted-swap recovery: simulate a crash that left one cell
    # renamed aside (live dir missing) — the next compaction restores it
    post = _os.path.join(out, "postings")
    cell = sorted(
        e for e in _os.listdir(post)
        if e.startswith("cid=") and _os.path.isdir(_os.path.join(post, e))
    )[0]
    _os.makedirs(_os.path.join(out, "_compact_old"), exist_ok=True)
    _os.rename(
        _os.path.join(post, cell), _os.path.join(out, "_compact_old", cell)
    )
    main(["ivf-compact", out])
    capsys.readouterr()
    assert _os.path.isdir(_os.path.join(post, cell))
    assert not _os.path.isdir(_os.path.join(out, "_compact_old"))
    recovered = sorted(
        tuple(r) for r in serve_ivf_artifact(spark, out, qs, vecs, k=5).collect()
    )
    assert recovered == before


def test_maintain_sq8_codes_build_and_append(spark, tmp_path, capsys):
    """`sq8-codes` persists the SQ8 index (frozen stats JSON + codes
    table); artifact-served top-k bit-equals the scan-form sq8_l2_panel
    (stored codes ARE the kernel intermediate); `sq8-codes-append`
    grows it at O(delta) under the FROZEN stats, and the grown index
    serves bit-equal to a one-shot encode of the full corpus under the
    same stats (X226 — the quantized ladder's last artifact rung)."""
    from pyspark.sql import functions as F

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.pq import (
        SQ8_STATS_FILE,
        load_sq8_stats,
        serve_sq8_artifact,
        sq8_l2_panel,
    )

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = vecs.where(F.col("vec_id") % 2 == 0)
    delta = vecs.where(F.col("vec_id") % 2 == 1)
    bdir, ddir = str(tmp_path / "b.parquet"), str(tmp_path / "d.parquet")
    base.write.parquet(bdir)
    delta.write.parquet(ddir)

    out = str(tmp_path / "sq8")
    main(["sq8-codes", out, bdir])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "sq8-codes"
    assert audit["n"] == base.count() and audit["dim"] == 64

    qs = vecs.where(F.col("vec_id") < 4)
    served = {
        tuple(r) for r in serve_sq8_artifact(spark, out, qs, 5).collect()
    }
    fresh = {tuple(r) for r in sq8_l2_panel(base, qs, 5).collect()}
    assert served == fresh and served

    main(["sq8-codes-append", out, ddir])
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["cmd"] == "sq8-codes-append"
    assert audit["n"] == vecs.count() and audit["delta"] == delta.count()

    import os as _os

    stats = load_sq8_stats(_os.path.join(out, SQ8_STATS_FILE))
    grown = {
        tuple(r) for r in serve_sq8_artifact(spark, out, qs, 5).collect()
    }
    want = {
        tuple(r) for r in sq8_l2_panel(vecs, qs, 5, stats=stats).collect()
    }
    assert grown == want and grown


def test_maintain_ivf_build_and_append(spark, tmp_path, capsys):
    """IVF index as maintained table state: build persists cells JSON +
    postings parquet; append assigns a delta against the LOADED cells
    (bit-identical reload) and grows postings at delta cost — no
    retrain. The appended rows must equal an in-process assignment
    against the reloaded artifact."""
    import json as _json

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.kmeans import load_centroids
    from mimic2ts_spark.operators.similarity import assign_vectors

    out = str(tmp_path / "ivf_idx")
    delta_dir = str(tmp_path / "delta")
    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    delta = embs.where(F.col("vec_id") < 40).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    delta.write.parquet(delta_dir)

    main(["ivf", out, f"{SF}/embeddings.parquet"])
    a1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a1["n_postings"] == a1["n_vectors"] == embs.count()

    # ARTIFACT SERVING (r12), pre-append: top-k from the persisted index
    # must bit-equal the scan-form ivf_topk on the same corpus
    # (deterministic training + the shared int-L2/lower-cid tie
    # discipline), and the postings scan must show the probed-cells
    # PARTITION filter (cid-partitioned layout: a probe reads only its
    # cells' files).
    from mimic2ts_spark.operators.similarity import ivf_topk, serve_ivf_artifact

    qs = embs.where(F.col("vec_id") < 5)
    served = {
        tuple(r) for r in serve_ivf_artifact(spark, out, qs, embs, k=5).collect()
    }
    direct = {
        tuple(r)
        for r in ivf_topk(embs, qs, k=5, cache_key=f"{SF}:ivf_serve_pin").collect()
    }
    assert served == direct and served

    plan = serve_ivf_artifact(
        spark, out, qs, embs, k=5
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    part = plan.split("PartitionFilters", 1)
    assert len(part) == 2 and "cid" in part[1][:120]

    main(["ivf-append", out, delta_dir])
    a2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a2["n_delta"] == 40
    assert a2["n_postings"] == a1["n_postings"] + 40

    cents, meta = load_centroids(f"{out}/centroids.json")
    assert meta["n_cells"] == len(cents) == a1["n_cells"]
    expect = {
        r.vec_id: (r.cid, r.d) for r in assign_vectors(delta, cents).collect()
    }
    got = {
        r.vec_id: (r.cid, r.d)
        for r in spark.read.parquet(f"{out}/postings")
        .where(F.col("vec_id") >= 1_000_000)
        .collect()
    }
    assert got == expect and len(got) == 40

    # the GROWN index serves the delta without retraining: every base
    # query's twin (+1e6, a byte-identical vector assigned to the same
    # cell) must now appear at rank 1 — cosine(x, x) tops every other
    # candidate on this corpus (max other-cosine ~0.4), and the twin is
    # always probed (it lives in the query's own top-1 cell).
    grown_src = embs.unionByName(delta)
    after = serve_ivf_artifact(spark, out, qs, grown_src, k=5).collect()
    rank1 = {r.query_id: r.neighbor_id for r in after if r.rank == 1}
    assert rank1 == {q: q + 1_000_000 for q in range(5)}


def test_maintain_bpe_artifact(spark, tmp_path, capsys):
    """The tokenizer merge table is an artifact: train+persist via the
    CLI, then applying with the LOADED merges must bit-equal applying
    with in-process training (zero training jobs on the apply side)."""
    import json as _json

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.bpe import bpe_apply_doc_stats, load_merges

    out = str(tmp_path / "bpe.json")
    main(["bpe", out, f"{SF}/documents.parquet"])
    a = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a["n_merges"] == a["rounds"] == 2

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rules = load_merges(out)
    assert [list(r) for r in rules] == a["merges"]
    fresh = {r.doc_id: tuple(r) for r in bpe_apply_doc_stats(docs).collect()}
    via = {
        r.doc_id: tuple(r)
        for r in bpe_apply_doc_stats(docs, merges=rules).collect()
    }
    assert fresh == via and fresh


def test_maintain_postings_build_append_serve(spark, tmp_path, capsys):
    """Search-index artifact: build on a base slice, serve BM25 FROM the
    index (must bit-equal the corpus-scan bm25_topk on the same slice),
    append a NEW-docs delta, and the index-served result must then
    bit-equal the corpus-scan form over the FULL corpus — per-term df
    recomputes from postings, stats add. The query-term scan must show
    the pushed In(term, ...) filter."""
    import json as _json

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.search import bm25_from_postings, bm25_topk

    out = str(tmp_path / "idx")
    base_dir = str(tmp_path / "base")
    delta_dir = str(tmp_path / "delta")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.where(F.col("doc_id") % 10 != 0).write.parquet(base_dir)
    docs.where(F.col("doc_id") % 10 == 0).write.parquet(delta_dir)
    terms = ("data", "model", "training")

    main(["postings", out, base_dir])
    a1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    base = spark.read.parquet(base_dir)
    assert a1["n_docs"] == base.count()

    with open(f"{out}/stats.json") as f:
        stats = _json.load(f)
    served = bm25_from_postings(spark, f"{out}/postings", stats, terms).collect()
    direct = bm25_topk(base, terms).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in direct]

    plan = bm25_from_postings(
        spark, f"{out}/postings", stats, terms
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "In(term" in plan

    main(["postings-append", out, delta_dir])
    a2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a2["n_docs"] == docs.count()
    with open(f"{out}/stats.json") as f:
        stats2 = _json.load(f)
    served2 = bm25_from_postings(spark, f"{out}/postings", stats2, terms).collect()
    direct2 = bm25_topk(docs, terms).collect()
    assert [tuple(r) for r in served2] == [tuple(r) for r in direct2]

    # FILTERED serving (X224 — the lexical twin of filtered ANN):
    # candidates semi-join the allowed set BEFORE the top-k cut with
    # CORPUS-level df/stats. Must equal filtering the full scored
    # relation pre-cut (= the full ranking restricted to allowed docs),
    # and a selective filter must still return a full k — the property
    # the post-filtered form loses.
    k = 10
    allowed = docs.where(F.col("doc_id") % 3 == 1).select("doc_id")
    flt = bm25_from_postings(
        spark, f"{out}/postings", stats2, terms, k=k, allowed=allowed
    ).collect()
    full = bm25_from_postings(
        spark, f"{out}/postings", stats2, terms, k=docs.count()
    ).collect()
    allowed_ids = {r.doc_id for r in allowed.collect()}
    expect = [tuple(r) for r in full if r.doc_id in allowed_ids][:k]
    assert [tuple(r) for r in flt] == expect and len(flt) == k
    post_filtered = [tuple(r) for r in full[:k] if r[0] in allowed_ids]
    assert len(post_filtered) < k  # the form this operator exists to avoid


def test_maintain_canon_postings_build_append_compact(spark, tmp_path, capsys):
    """r15 (VERDICT r14 #7): the canonical inverted index the panel-BM25
    evals serve from is maintained table state. Round-trip pins:
    (a) the full build equals the from-scratch canonical relation;
    (b) `canon-postings-append` grows it at O(delta) — appended
        postings/doclens/canon_map rows bit-equal a fresh rebuild over
        base+delta (NEW-ids, duplicate-text delta rows resolve through
        the stored map and add nothing);
    (c) a REPLAYED delta appends nothing (idempotent);
    (d) `canon-postings-compact` leaves every row identical while
        shrinking the fragmented dirs to one file each."""
    import json as _json

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.dedup import canonical_docs
    from mimic2ts_spark.operators.search import (
        build_postings,
        load_canon_postings,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = docs.where(F.col("doc_id") % 10 != 0)
    # delta: new ids, half of them DUPLICATE texts of stored docs —
    # those must resolve through the canon_map and append nothing
    fresh = docs.where(F.col("doc_id") % 10 == 0)
    dup = base.limit(20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    delta = fresh.select("doc_id", "text").unionByName(dup)
    base_dir = str(tmp_path / "base")
    delta_dir = str(tmp_path / "delta")
    base.write.parquet(base_dir)
    delta.write.parquet(delta_dir)

    out = str(tmp_path / "cpost")
    main(["canon-postings", out, base_dir])
    a1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a1["n_canon"] == canonical_docs(base).count()

    def key(df):
        return sorted(tuple(r) for r in df.collect())

    post, dl = load_canon_postings(spark, out)
    expect_base = build_postings(canonical_docs(base)).select(
        "term", F.col("doc_id").alias("doc"), "tf", "dl"
    )
    assert key(post) == key(expect_base)

    main(["canon-postings-append", out, delta_dir])
    a2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # appended canonicals = delta texts not already stored
    grown = base.select("doc_id", "text").unionByName(delta)
    expect_grown = build_postings(canonical_docs(grown)).select(
        "term", F.col("doc_id").alias("doc"), "tf", "dl"
    )
    post2, dl2 = load_canon_postings(spark, out)
    assert key(post2) == key(expect_grown)
    assert a2["n_canon"] == canonical_docs(grown).count() == dl2.count()
    # the duplicate-text rows added nothing: no canon_map entry points
    # at a dup id
    cmap = spark.read.parquet(f"{out}/canon_map")
    assert cmap.where(F.col("canon") >= 1_000_000).count() == 0

    # replayed delta: idempotent no-op
    main(["canon-postings-append", out, delta_dir])
    a3 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a3["n_delta"] == 0
    post3, _ = load_canon_postings(spark, out)
    assert key(post3) == key(expect_grown)

    # compact: rows identical, fragmented dirs down to one file each
    before = key(post3)
    main(["canon-postings-compact", out])
    a4 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a4["postings"]["compacted"] and a4["postings"]["files_after"] == 1
    post4, dl4 = load_canon_postings(spark, out)
    assert key(post4) == before and dl4.count() == a2["n_canon"]


def test_maintain_positional_postings_phrase_serve(spark, tmp_path, capsys):
    """Positional-index artifact (X164): `postings --positions` persists
    the (term, doc_id, positions) index beside the BM25 postings; phrase
    queries served FROM it must bit-equal the corpus-scan
    phrase_occurrences on the same slice, stay equal after a NEW-docs
    `postings-append --positions` delta (new doc_ids => rows append, no
    array merges), and the served scan must show the pushed In(term, ...)
    vocabulary filter (term-sorted files => rowgroup skip)."""
    import json as _json

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.search import (
        phrase_from_postings,
        phrase_occurrences,
    )

    out = str(tmp_path / "idx")
    base_dir = str(tmp_path / "base")
    delta_dir = str(tmp_path / "delta")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.where(F.col("doc_id") % 10 != 0).write.parquet(base_dir)
    docs.where(F.col("doc_id") % 10 == 0).write.parquet(delta_dir)
    phrases = ("table hash", "part filter")

    main(["postings", out, base_dir, "--positions"])
    a1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a1["n_positional"] > 0

    def key(rows):
        return sorted(tuple(r) for r in rows)

    base = spark.read.parquet(base_dir)
    served = phrase_from_postings(spark, f"{out}/positions", phrases)
    direct = phrase_occurrences(base, phrases)
    assert key(served.collect()) == key(direct.collect())

    plan = phrase_from_postings(
        spark, f"{out}/positions", phrases
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "In(term" in plan

    main(["postings-append", out, delta_dir, "--positions"])
    a2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a2["n_positional"] > a1["n_positional"]
    served2 = phrase_from_postings(spark, f"{out}/positions", phrases)
    direct2 = phrase_occurrences(docs, phrases)
    assert key(served2.collect()) == key(direct2.collect())


def test_maintain_trigram_postings_substring_serve(spark, tmp_path, capsys):
    """Trigram-index artifact (X166): `postings --trigrams` persists the
    (gram, doc_id) char-trigram index; substring search served FROM it
    (gram-pruned candidates, all-trigrams intersection, exact verify)
    must bit-equal the corpus-scan substring_occurrences on the base
    slice AND after a NEW-docs `postings-append --trigrams` delta; the
    index scan must show the pushed In(gram, ...) filter; needles
    shorter than 3 chars are rejected (no trigrams)."""
    import json as _json

    import pytest as _pytest

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.search import (
        substring_from_trigram_postings,
        substring_occurrences,
    )

    out = str(tmp_path / "idx")
    base_dir = str(tmp_path / "base")
    delta_dir = str(tmp_path / "delta")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.where(F.col("doc_id") % 10 != 0).write.parquet(base_dir)
    docs.where(F.col("doc_id") % 10 == 0).write.parquet(delta_dir)
    needles = ("able", "hash ta")

    main(["postings", out, base_dir, "--trigrams"])
    a1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a1["n_trigram"] > 0

    def key(rows):
        return sorted(tuple(r) for r in rows)

    base = spark.read.parquet(base_dir)
    served = substring_from_trigram_postings(spark, f"{out}/trigrams", base, needles)
    assert key(served.collect()) == key(substring_occurrences(base, needles).collect())

    plan = substring_from_trigram_postings(
        spark, f"{out}/trigrams", base, needles
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "In(gram" in plan

    with _pytest.raises(ValueError):
        substring_from_trigram_postings(spark, f"{out}/trigrams", base, ("ab",))

    main(["postings-append", out, delta_dir, "--trigrams"])
    a2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a2["n_trigram"] > a1["n_trigram"]
    served2 = substring_from_trigram_postings(spark, f"{out}/trigrams", docs, needles)
    assert key(served2.collect()) == key(substring_occurrences(docs, needles).collect())


def test_maintain_ddq_build_append_serve(spark, tmp_path, capsys):
    """Quantile-sketch artifact (X165/X170): `maintain ddq` persists the
    per-group counter table; the artifact-served report must bit-equal
    the from-scratch sketch on the base slice, `ddq-append` is a blind
    row append (counters ADD, merged at read), after which the served
    report must bit-equal the from-scratch sketch over the FULL corpus;
    state stays O(groups * 16 * log2(max)) rows."""
    import json as _json

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.sketch import (
        ddq_counters,
        ddq_from_artifact,
        ddq_quantiles,
    )

    out = str(tmp_path / "sk")
    base_dir = str(tmp_path / "base")
    delta_dir = str(tmp_path / "delta")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.where(F.col("event_id") % 10 != 0).write.parquet(base_dir)
    ev.where(F.col("event_id") % 10 == 0).write.parquet(delta_dir)
    cents = "CAST(round(value * 100, 0) AS BIGINT)"

    def key(rows):
        return sorted(tuple(r) for r in rows)

    main(["ddq", out, base_dir])
    a1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a1["n_groups"] == 5 and a1["n_counter_rows"] <= 5 * 16 * 64

    base = spark.read.parquet(base_dir)
    served = ddq_from_artifact(spark, f"{out}/counters", ["event_type"])
    direct = ddq_quantiles(ddq_counters(base, ["event_type"], cents), ["event_type"])
    assert key(served.collect()) == key(direct.collect())

    main(["ddq-append", out, delta_dir])
    a2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a2["n_counter_rows"] >= a1["n_counter_rows"]

    served2 = ddq_from_artifact(spark, f"{out}/counters", ["event_type"])
    direct2 = ddq_quantiles(ddq_counters(ev, ["event_type"], cents), ["event_type"])
    assert key(served2.collect()) == key(direct2.collect())


def test_maintain_minhash_index_incremental_serve(spark, tmp_path, capsys):
    """Banding-index artifact (X172): `minhash-index` persists the
    (band, key, doc_id, codes) state; incremental dedup of a delta
    SERVED from the index must bit-equal the cross-side pairs of the
    full-corpus minhash_lsh_pairs (same banding candidates, same
    verify), and after `minhash-index-append` of the first delta, a
    SECOND delta's served pairs must match against the grown corpus —
    the corpus is never re-scanned or re-hashed."""
    import json as _json

    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.dedup import (
        incremental_pairs_from_index,
        minhash_lsh_pairs,
    )

    out = str(tmp_path / "mh")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = docs.where(F.col("doc_id") % 10 > 1)
    d1 = docs.where(F.col("doc_id") % 10 == 0)
    d2 = docs.where(F.col("doc_id") % 10 == 1)
    base_dir = str(tmp_path / "base")
    d1_dir = str(tmp_path / "d1")
    base.write.parquet(base_dir)
    d1.write.parquet(d1_dir)

    def expected(corpus, delta):
        """Cross-side pairs of the full minhash run, oriented (new, old)."""
        full = minhash_lsh_pairs(corpus.unionByName(delta))
        new_ids = {r.doc_id for r in delta.select("doc_id").collect()}
        out_pairs = {}
        for r in full.collect():
            a_new, b_new = r.doc_a in new_ids, r.doc_b in new_ids
            if a_new != b_new:
                k = (r.doc_a, r.doc_b) if a_new else (r.doc_b, r.doc_a)
                out_pairs[k] = r.jaccard
        return out_pairs

    main(["minhash-index", out, base_dir])
    a1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a1["n_band_rows"] == a1["n_docs"] * 4  # BANDS rows per doc

    got1 = {
        (r.doc_new, r.doc_old): r.jaccard
        for r in incremental_pairs_from_index(spark, f"{out}/bands", d1).collect()
    }
    assert got1 == expected(base, d1) and got1

    main(["minhash-index-append", out, d1_dir])
    a2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a2["n_docs"] == a1["n_docs"] + d1.count()

    got2 = {
        (r.doc_new, r.doc_old): r.jaccard
        for r in incremental_pairs_from_index(spark, f"{out}/bands", d2).collect()
    }
    assert got2 == expected(base.unionByName(d1), d2)


def test_maintain_cluster_append_equals_full_recompute(spark, tmp_path, capsys):
    """O(delta) label maintenance (X175): `cluster-append` must leave
    the labels table IDENTICAL to a from-scratch `cluster` over the
    grown corpus, across TWO successive deltas — CC over incrementally
    merged supernodes equals CC over the union edge set, and the
    min-id label invariant survives because old labels are their
    components' minima."""
    import json as _json

    from mimic2ts_spark.maintain import main

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    parts = {
        "base": docs.where(F.col("doc_id") % 10 > 1),
        "d1": docs.where(F.col("doc_id") % 10 == 0),
        "d2": docs.where(F.col("doc_id") % 10 == 1),
    }
    dirs = {}
    for name, df in parts.items():
        dirs[name] = str(tmp_path / name)
        df.write.parquet(dirs[name])
    for name, df in (
        ("base_d1", parts["base"].unionByName(parts["d1"])),
        ("all", docs),
    ):
        dirs[name] = str(tmp_path / name)
        df.write.parquet(dirs[name])

    idx = str(tmp_path / "idx")
    labels = str(tmp_path / "labels")
    main(["minhash-index", idx, dirs["base"]])
    main(["cluster", labels, dirs["base"]])

    def read_labels(path):
        return {
            r.doc_id: r.cluster_id for r in spark.read.parquet(path).collect()
        }

    def full(path, src):
        main(["cluster", path, src])
        return read_labels(path)

    main(["cluster-append", labels, idx, dirs["d1"]])
    a1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a1["n_docs"] == parts["base"].count() + parts["d1"].count()
    assert read_labels(labels) == full(str(tmp_path / "f1"), dirs["base_d1"])

    main(["cluster-append", labels, idx, dirs["d2"]])
    assert read_labels(labels) == full(str(tmp_path / "f2"), dirs["all"])


def test_maintain_cluster_append_canonical_layout(spark, tmp_path, capsys):
    """X176: with the --canonical index layout (bands over canonicals +
    exact md5 map), cluster-append must STILL leave labels identical to
    the from-scratch recompute across two deltas — exact-attach edges
    plus canonical near-dup edges generate the same components as the
    raw pair graph — while only genuinely new texts' canonicals ever
    enter the banding stage (band rows grow by <= 4x new distinct
    texts, audited)."""
    import json as _json

    from mimic2ts_spark.maintain import main

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    parts = {
        "base": docs.where(F.col("doc_id") % 10 > 1),
        "d1": docs.where(F.col("doc_id") % 10 == 0),
        "d2": docs.where(F.col("doc_id") % 10 == 1),
    }
    dirs = {}
    for name, df in parts.items():
        dirs[name] = str(tmp_path / name)
        df.write.parquet(dirs[name])
    for name, df in (
        ("base_d1", parts["base"].unionByName(parts["d1"])),
        ("all", docs),
    ):
        dirs[name] = str(tmp_path / name)
        df.write.parquet(dirs[name])

    idx = str(tmp_path / "idx")
    labels = str(tmp_path / "labels")
    main(["minhash-index", idx, dirs["base"], "--canonical"])
    a0 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a0["n_docs"] == a0["n_distinct_texts"]  # canonical-only bands
    main(["cluster", labels, dirs["base"]])
    capsys.readouterr()

    def read_labels(path):
        return {
            r.doc_id: r.cluster_id for r in spark.read.parquet(path).collect()
        }

    def full(path, src):
        main(["cluster", path, src])
        capsys.readouterr()
        return read_labels(path)

    main(["cluster-append", labels, idx, dirs["d1"]])
    a1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a1["n_docs"] == parts["base"].count() + parts["d1"].count()
    assert read_labels(labels) == full(str(tmp_path / "f1"), dirs["base_d1"])

    main(["cluster-append", labels, idx, dirs["d2"]])
    capsys.readouterr()
    assert read_labels(labels) == full(str(tmp_path / "f2"), dirs["all"])


def test_maintain_knn_graph_build_append_serve(spark, tmp_path, capsys):
    """X184: the k-NN graph as maintained state. Build on 400 vectors,
    append the other 100 at delta cost (beam-search insertion + exact
    within-batch pairs + reverse adoption), then pin:
    (a) structure — every id has <= k unique ascending-ranked rows,
        delta d2 values equal exact integer distances;
    (b) QUALITY — merged-graph recall@8 vs the true graph stays within
        0.05 of a from-scratch build on the grown corpus (insertion is
        a different approximate path, so the contract is quality, not
        hashes);
    (c) serving from the merged artifact clears the beam recall floor."""
    import math

    import numpy as np

    from mimic2ts_spark.operators.kmeans import QUANT
    from mimic2ts_spark.operators.knn import KNN_K, serve_knn_artifact

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    base_dir = str(tmp_path / "kbase")
    delta_dir = str(tmp_path / "kdelta")
    art = str(tmp_path / "kg")
    scratch = str(tmp_path / "kg_scratch")
    embs.where(F.col("vec_id") < 400).write.parquet(base_dir)
    embs.where(F.col("vec_id") >= 400).write.parquet(delta_dir)

    a1 = _run("knn-graph", art, base_dir)
    assert a1["n"] == 400 and a1["k"] == KNN_K
    a2 = _run("knn-graph-append", art, delta_dir)
    assert a2["n"] == 500 and a2["delta"] == 100
    assert a2["rescored"] <= 100 * KNN_K

    rows = spark.read.parquet(f"{art}/graph").collect()
    per = {}
    for r in rows:
        per.setdefault(r.id, []).append((r.rank, r.nbr, r.d2))
    assert len(per) == 500
    vecs = {
        r.vec_id: np.array(
            [math.floor(float(v) * QUANT) for v in r.embedding], dtype=np.int64
        )
        for r in embs.collect()
    }
    for i, lst in per.items():
        lst.sort()
        assert len(lst) <= KNN_K
        assert [r for r, _, _ in lst] == list(range(1, len(lst) + 1))
        assert len({b for _, b, _ in lst}) == len(lst)
        ds = [d for _, _, d in lst]
        assert ds == sorted(ds)
    for i in range(400, 500):
        for _, b, d in per[i]:
            assert d == int(((vecs[i] - vecs[b]) ** 2).sum())

    # quality vs from-scratch on the grown corpus
    a3 = _run("knn-graph", scratch, f"{SF}/embeddings.parquet")
    assert a3["n"] == 500

    def recall(graph_dir):
        got = {}
        for r in spark.read.parquet(f"{graph_dir}/graph").collect():
            got.setdefault(r.id, set()).add(r.nbr)
        ids = np.array(sorted(vecs))
        X = np.stack([vecs[i] for i in ids])
        hit = tot = 0
        for ix in range(len(ids)):
            D = ((X - X[ix]) ** 2).sum(axis=1)
            D[ix] = np.iinfo(np.int64).max
            true = {ids[j] for j in np.lexsort((ids, D))[:KNN_K]}
            hit += len(true & got.get(ids[ix], set()))
            tot += KNN_K
        return hit / tot

    r_merged, r_scratch = recall(art), recall(scratch)
    assert r_merged >= r_scratch - 0.05, (r_merged, r_scratch)

    served = serve_knn_artifact(
        spark, art, embs.where(F.col("vec_id") < 32), k=5
    )
    got = {}
    for r in served.collect():
        got.setdefault(r.qid, set()).add(r.nbr)
    ids = np.array(sorted(vecs))
    X = np.stack([vecs[i] for i in ids])
    hit = tot = 0
    for ix in range(len(ids)):
        if ids[ix] >= 32:
            continue
        D = ((X - X[ix]) ** 2).sum(axis=1)
        true = {ids[j] for j in np.lexsort((ids, D))[:5]}
        hit += len(true & got.get(ids[ix], set()))
        tot += 5
    assert hit / tot >= 0.85


def test_streaming_knn_ingest_equals_direct_append(spark, tmp_path):
    """X194: the availableNow drain over the single staged embeddings
    file is one microbatch, so the streamed artifact must equal the
    direct build + one append on the same split — and clear the X184
    structure invariants."""
    from pyspark.sql import functions as F

    from mimic2ts_spark.operators.knn import (
        KNN_K,
        append_knn_artifact,
        build_knn_artifact,
    )
    from mimic2ts_spark.streaming import run_knn_ingest_available_now

    stream_dir = str(tmp_path / "kg_stream")
    direct_dir = str(tmp_path / "kg_direct")
    got = run_knn_ingest_available_now(spark, SF, stream_dir)

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_knn_artifact(
        spark, direct_dir, embs.where(F.col("vec_id") % 10 != 0)
    )
    append_knn_artifact(
        spark, direct_dir, embs.where(F.col("vec_id") % 10 == 0)
    )
    want = spark.read.parquet(f"{direct_dir}/graph")
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w
    per: dict = {}
    for i, nbr, d2, rank in g:
        per.setdefault(i, []).append(rank)
    assert len(per) == embs.count()
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= KNN_K
               for v in per.values())


def test_maintain_impacts_build_append_maxscore_serve(spark, tmp_path, capsys):
    """Impact-index artifact (X200): `postings --impacts` persists the
    per-term (df, u_max) scalars; MaxScore served FROM the CLI artifacts
    must bit-equal full corpus-scan BM25 on the long-tail panel, the
    prune must FIRE, and `postings-append --impacts` must REBUILD the
    impacts (stale u_max could under-bound and break the prune theorem)
    so the served result stays equal over the FULL corpus."""
    import json as _json

    from mimic2ts_spark.harness_ext import BM25_LONGTAIL_TERMS
    from mimic2ts_spark.maintain import main
    from mimic2ts_spark.operators.search import (
        _TERM_IMPACTS_CACHE,
        bm25_topk,
        bm25_topk_maxscore_from_postings,
    )

    out = str(tmp_path / "idx")
    base_dir = str(tmp_path / "base")
    delta_dir = str(tmp_path / "delta")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.where(F.col("doc_id") % 10 != 0).write.parquet(base_dir)
    docs.where(F.col("doc_id") % 10 == 0).write.parquet(delta_dir)

    main(["postings", out, base_dir, "--impacts"])
    a1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a1["n_impact_terms"] > 0
    with open(f"{out}/stats.json") as f:
        stats = _json.load(f)
    st: dict = {}
    served = bm25_topk_maxscore_from_postings(
        spark, f"{out}/postings", f"{out}/impacts", stats,
        BM25_LONGTAIL_TERMS, _stats=st,
    ).collect()
    base = spark.read.parquet(base_dir)
    direct = bm25_topk(base, BM25_LONGTAIL_TERMS).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in direct]
    assert st["pruned"] is True and st["anchor"] == "dup"

    main(["postings-append", out, delta_dir, "--impacts"])
    a2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a2["n_docs"] == docs.count()
    # NO manual memo clear: the fingerprint-keyed memo must see the
    # in-place rebuild itself (ADVICE r08) — a stale hit here would
    # serve the pre-append u_max and fail the full-corpus equality below.
    assert any(k[0] == f"{out}/impacts" for k in _TERM_IMPACTS_CACHE)
    with open(f"{out}/stats.json") as f:
        stats2 = _json.load(f)
    served2 = bm25_topk_maxscore_from_postings(
        spark, f"{out}/postings", f"{out}/impacts", stats2, BM25_LONGTAIL_TERMS
    ).collect()
    direct2 = bm25_topk(docs, BM25_LONGTAIL_TERMS).collect()
    assert [tuple(r) for r in served2] == [tuple(r) for r in direct2]
