"""Scale sweep for ``export_shards`` — wall-clock and layout behavior as
rows × shard count grow.

The operator's claim (operators/corpus.py): one hash shuffle, per-shard
sorts bounded at ``|corpus| / n_shards`` rows, one-file-per-shard, and a
manifest that is one aggregate over the written files.  This sweep
synthesizes an N-row corpus with a ~200-byte payload (``spark.range`` —
deterministic, no fixture dependency), exports it at several shard
counts, and asserts the layout contract while timing the write and the
manifest pass separately.

What to look for (SCALE.md records a run):

- write time should grow ~linearly in N and be FLAT-ish in n_shards
  (more, smaller sorts — same shuffle volume); a superlinear jump at
  high n_shards would mean per-file overhead dominates (too many tiny
  files — the TUNING.md "reader budget" knob read backwards);
- manifest time is a second bounded scan of the written bytes;
- ``n_files == n_shards`` at every point (the one-task-per-shard
  contract holding as counts grow).

Usage::

    PYTHONPATH=/root/repo python tools/export_scale.py [rows ...]

Defaults: 100_000 and 1_000_000 rows, shards in (8, 64, 256).
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(row_counts: list[int]) -> None:
    from database_transportor_spark.operators.corpus import export_shards

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("export_scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in row_counts:
        # ~200 B of INCOMPRESSIBLE payload per row (sha2 of salted ids)
        # so the written bytes reflect real data volume, not snappy
        # collapsing a constant pad
        docs = (
            spark.range(n)
            .withColumnRenamed("id", "doc_id")
            .withColumn(
                "text",
                F.concat(*[
                    F.sha2(F.concat(F.lit(str(s)), F.col("doc_id")
                                    .cast("string")), 256)
                    for s in range(3)
                ]),
            )
            .withColumn("n_tok", (F.col("doc_id") % 97 + 1).cast("long"))
        )
        for shards in (8, 64, 256):
            dest = tempfile.mkdtemp(prefix=f"exs_{n}_{shards}_") + "/s"
            t0 = time.monotonic()
            man = export_shards(
                docs, dest, "doc_id", shards, seed=1, token_col="n_tok"
            )
            # export_shards returns a lazy manifest; the write itself has
            # already happened — time the manifest aggregate separately
            t1 = time.monotonic()
            rows = man.collect()
            t2 = time.monotonic()
            total = sum(r["n_rows"] for r in rows)
            files = sum(r["n_files"] for r in rows)
            gb = sum(r["bytes"] for r in rows) / 1e9
            assert total == n, (total, n)
            assert files == len(rows) == shards, (files, len(rows), shards)
            assert all(
                r["min_pos"] == 1 and r["max_pos"] == r["n_rows"]
                for r in rows
            )
            print(
                f"rows={n:>9,}  shards={shards:>4}  "
                f"write={t1 - t0:6.2f}s  manifest={t2 - t1:5.2f}s  "
                f"data={gb:.3f} GB  files={files}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    counts = [int(a.replace("_", "")) for a in sys.argv[1:]] or [
        100_000, 1_000_000,
    ]
    main(counts)
