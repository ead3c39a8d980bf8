"""spark-submit entry: curated corpus → packed training shards.

Two packing regimes downstream trainers ask for, both layered on the
curated parquet that jobs/curate_corpus.py writes:

  --mode ffd   (default) no-split FFD bin packing for SFT/fine-tuning
               (operators/packing.pack_bins_ffd): each doc lands in
               exactly one fixed-capacity bin, padding minimized.
  --mode iclm  in-context-pretraining ordering (operators/iclm
               .iclm_pack): semantically-related docs pack into the
               same context window; embeddings come from the corpus
               itself via the model-free hashed-TF bridge
               (operators/hashvec) unless the input already carries
               an embedding column.

Output: parquet sorted by (bin/pack, position) so a reader streams
training examples in order, plus a one-row efficiency report on
stdout. The writer repartitions by the bin key — packs are written
whole, never split across files.

    spark-submit --py-files nidaba_spark.zip jobs/pack_sft.py \
        --input out/curated --out out/sft_packs --capacity 2048
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def build(spark: SparkSession, args: argparse.Namespace):
    from nidaba_spark.operators.packing import bin_stats, pack_bins_ffd

    docs = spark.read.parquet(args.input)
    # the curated parquet already carries curate()'s own packing
    # columns (tokens_before/pack_id/pack_pos) — drop them before
    # joining this job's fresh assignment or every reference to
    # pack_id/bin below is AMBIGUOUS and the job crashes on its own
    # documented input (review r05). drop() ignores absent names.
    docs = docs.drop("tokens_before", "pack_id", "pack_pos", "bin", "bin_pos")
    n_tokens = F.col(args.token_col)
    if args.mode == "ffd":
        # lazy localCheckpoint: the stats collect below and the final
        # write would otherwise each execute the full packing plan
        packed = pack_bins_ffd(
            docs,
            n_tokens,
            args.capacity,
            id_col=args.id_col,
            num_groups=args.num_groups,
        ).localCheckpoint(eager=False)
        stats = bin_stats(packed, args.capacity).collect()[0].asDict()
        out = (
            docs.join(packed.drop("n_tokens"), args.id_col)
            .repartition(F.col("bin"))
            .sortWithinPartitions("bin", "bin_pos")
        )
        return out, stats
    from nidaba_spark.operators.hashvec import hashed_tf_embedding
    from nidaba_spark.operators.iclm import iclm_pack

    if "embedding" in docs.columns:
        # derive the dimension from the data: --dim describes the
        # hashed-TF bridge, not a pre-embedded column, and a mismatch
        # crashes deep inside the k-means pandas UDF (review r05)
        row = (
            docs.select(F.size(F.col("embedding")).alias("d"))
            .filter(F.col("d") > 0)
            .first()
        )
        vecs, dim = docs, (int(row["d"]) if row is not None else args.dim)
    else:
        vecs = hashed_tf_embedding(
            docs, dim=args.dim, text_col=args.text_col, id_col=args.id_col
        )
        dim = args.dim
    packed = iclm_pack(
        docs,
        n_tokens,
        args.capacity,
        vectors=vecs,
        nlist=args.nlist,
        dim=dim,
        id_col=args.id_col,
        vec_id_col=args.id_col,
    ).localCheckpoint(eager=False)
    stats = (
        packed.agg(
            F.countDistinct("pack_id").alias("n_packs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .collect()[0]
        .asDict()
    )
    out = (
        docs.join(packed.drop("n_tokens"), args.id_col)
        .repartition(F.col("pack_id"))
        .sortWithinPartitions("pack_id", "pack_pos")
    )
    return out, stats


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="curated parquet path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["ffd", "iclm"], default="ffd")
    ap.add_argument("--capacity", type=int, default=2048)
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--token-col", default="n_tokens")
    ap.add_argument("--text-col", default="text")
    ap.add_argument(
        "--num-groups", type=int, default=None,
        help="FFD hash groups; PIN this for cross-cluster-size "
        "reproducible assignments (defaults to the cluster's "
        "parallelism)",
    )
    ap.add_argument("--nlist", type=int, default=64, help="iclm cells")
    ap.add_argument("--dim", type=int, default=64, help="hashed-TF dim")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("nidaba-pack-sft").getOrCreate()
    from nidaba_spark.session import tune_session

    tune_session(spark)
    out, stats = build(spark, args)
    out.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"mode": args.mode, **{k: (float(v) if hasattr(v, "__float__") else v) for k, v in stats.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
