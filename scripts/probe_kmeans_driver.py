#!/usr/bin/env python
"""Bit-equality gate for the driver-side Lloyd fast path.

For every parameterization the bench/oracle queries use (IVF builds,
semantic clustering's sqrt-n quantizer, PQ sub-space codebooks),
computes kmeans_centroids with KMEANS_DRIVER on and off over the REAL
embeddings tables and asserts the centroid sets are bit-identical.
Any mismatch prints the offending config and exits 1 (the fast path
must then be dropped, per the round's rules).

Run: python scripts/probe_kmeans_driver.py [sf_dir ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

DIRS = sys.argv[1:] or [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> None:
    from pyspark.sql import functions as F

    from pyairbyte_spark import get_spark
    from pyairbyte_spark.operators import similarity as sim

    spark = get_spark(
        "kmeans-driver-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    bad = 0
    for d in DIRS:
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        n = emb.count()
        dim = len(emb.select("embedding").first()[0])
        sqrt_n = max(8, math.isqrt(n))
        configs = [
            {"n_centroids": 8, "iters": 1, "train_modulus": 1},
            {"n_centroids": 8, "iters": 2, "train_modulus": 1},
            {"n_centroids": 16, "iters": 1, "train_modulus": 4},
            {"n_centroids": sqrt_n, "iters": 1, "train_modulus": 1},
            {"n_centroids": 40, "iters": 2, "train_modulus": 2},
        ]
        frames = [("full", emb, "embedding")]
        # PQ sub-space slices (m=4 shape)
        dsub = dim // 4
        for j in (0, 3):
            frames.append(
                (
                    f"sub{j}",
                    emb.select(
                        "vec_id",
                        F.slice(
                            sim.as_double_vec("embedding"),
                            j * dsub + 1,
                            dsub,
                        ).alias("sub"),
                    ),
                    "sub",
                )
            )
        for tag, frame, vcol in frames:
            for cfg in configs:
                def run():
                    got = sim.kmeans_centroids(
                        frame, id_col="vec_id", vec_col=vcol, **cfg
                    )
                    rows = getattr(got, "_sg_local_rows", None) or got.collect()
                    return sorted(
                        (r["cid"], tuple(r["cv"])) for r in rows
                    )

                sim.KMEANS_DRIVER = True
                new = run()
                sim.KMEANS_DRIVER = False
                old = run()
                sim.KMEANS_DRIVER = True
                ok = new == old
                if not ok:
                    bad += 1
                    diffs = [
                        (a, b) for a, b in zip(new, old) if a != b
                    ][:2]
                    print(f"MISMATCH {d} {tag} {cfg}: {diffs}")
                else:
                    print(f"ok {os.path.basename(d)} {tag} {cfg} "
                          f"({len(new)} centroids)")
                sys.stdout.flush()
    spark.stop()
    if bad:
        sys.exit(1)
    print("ALL EQUAL")


if __name__ == "__main__":
    main()
