"""End-to-end training-data curation walkthrough on the test corpus:

scan → text profile (quality/language) → exact dedup → near-dup removal
(MinHash-LSH) → PII redaction → temperature-flattened source mixing →
chunk into token windows → pack into fixed-token training sequences →
shard stats, with one-pass observe metrics riding the final write.

Every stage is the library operator the oracle-checked queries use; this
script is the "switching user's" view of how they compose. Runs on
sf0.001 in under a minute: ``python examples/pipeline_demo.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from adhesive_spark.operators.curation import (  # noqa: E402
    redact_pii,
    temperature_mixture,
)
from adhesive_spark.operators.monitoring import (  # noqa: E402
    corpus_metrics,
    observed_write,
)
from adhesive_spark.operators.dedup import dedup_minhash  # noqa: E402
from adhesive_spark.operators.text import (  # noqa: E402
    chunk_documents,
    pack_sequences,
    text_profile,
)
from adhesive_spark.session import build_spark  # noqa: E402
from adhesive_spark.sources.registry import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = build_spark(app_name="adhesive-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    print(f"corpus: {docs.count()} documents")

    # 1. profile + filter: keep english docs above the quality floor
    profiled = text_profile(docs, "text")
    kept = profiled.where(
        (F.col("lang_pred") == "en") & (F.col("quality") >= 0.5)
    )
    print(f"after lang+quality filter: {kept.count()}")

    # 2. exact dedup happens inside the near-dup pass's candidate set;
    #    MinHash-LSH then drops fuzzy duplicates of lower-id docs
    deduped = dedup_minhash(
        kept.select("doc_id", "text"), "text", "doc_id", threshold=0.5
    )
    print(f"after near-dup removal: {deduped.count()}")

    # 3. PII scrub (keep source for the mixing step)
    clean = deduped.join(docs.select("doc_id", "source"), "doc_id").select(
        "doc_id", "source", redact_pii(F.col("text")).alias("text")
    )

    # 3b. temperature-0.5 mixture: flatten source skew (sqrt shares)
    mixed = temperature_mixture(clean, "doc_id", "source")
    print(f"after temperature mixing: {mixed.count()}")
    clean = mixed

    # 4. chunk into 128-token windows (stride 96 → 32-token overlap)
    chunks = chunk_documents(clean, "text", "doc_id", chunk_size=128, stride=96)

    # 5. pack chunks into 512-token training sequences
    packed = pack_sequences(
        chunks.withColumn("shard", F.col("doc_id") % 4),
        "shard",
        ["doc_id", "chunk_id"],
        seq_tokens=512,
    )
    stats = packed.groupBy("shard").agg(
        F.countDistinct("doc_id").alias("docs"),
        F.count("*").alias("chunks"),
        (F.max("seq_idx") + 1).alias("sequences"),
        F.sum("n_tokens").alias("tokens"),
    )
    stats.orderBy("shard").show()

    # 5b. governance gate before release: k-anonymity screen over the
    #     (source, length-bucket) quasi-identifiers, then masked export
    #     ids (pseudonyms) — the q179/q193 stages of the q200 flow
    from adhesive_spark.operators.curation import (
        apply_masking_policy,
        k_anonymity_screen,
    )

    risk = k_anonymity_screen(
        clean.select("source", (F.length("text") / 500).cast("long").alias("len_b")),
        ["source", "len_b"],
        k=5,
    )
    n_risky = risk.where("at_risk").count()
    print(f"k-anonymity: {n_risky} at-risk quasi-identifier classes")

    # 6. write the packed set with audit counters gathered DURING the
    #    write (df.observe — no second scan); ids leave as md5-prefix
    #    pseudonyms (referentially stable, irreversible)
    import tempfile

    out = tempfile.mkdtemp(prefix="adhesive_demo_out_")
    release = apply_masking_policy(
        packed.join(clean, "doc_id").select("doc_id", "shard", "text"),
        {"doc_id": "hash"},
    )
    audit = observed_write(release, out, metrics=corpus_metrics("text"))
    print(f"written to {out}; audit: {audit}")


if __name__ == "__main__":
    main()
