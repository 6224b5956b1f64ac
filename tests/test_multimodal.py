"""Value-level checks for the rows-only multimodal op (the driver's
gate only row-counts it)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_feature_extract_values_match_python(spark, duck, sf_dir):
    sdf = entrymod.queries()["mm_feature_extract_pandas"](spark, sf_dir)
    got = {r.doc_id: r for r in sdf.collect()}
    texts = dict(duck.execute("SELECT doc_id, text FROM documents").fetchall())
    assert set(got) == set(texts)
    for doc_id, text in list(texts.items())[:50]:
        raw = text.encode("utf-8")
        r = got[doc_id]
        assert r.n_bytes == len(raw)
        assert r.max_byte == max(raw)
        assert abs(r.mean_byte - sum(raw) / len(raw)) < 1e-9

def test_feature_extract_is_arrow_batched(spark, sf_dir):
    from noaa_data_pipeline_spark.plans import multimodal

    sdf = multimodal.mm_features_with_witness(spark, sf_dir)
    batch_sizes = {r.n_batch_rows for r in sdf.collect()}
    # vectorized Arrow batches, not per-row Python calls
    assert max(batch_sizes) > 1
