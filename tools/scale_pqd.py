"""SCALE row: pq_distortion (the auto PQ policy's drift trigger) at
1x vs 30x corpus with a TARGET-SIZE sample — production sizes
``sample_mod`` to a fixed sample (n / target), so the measured job
should be ~flat modulo the pushed-down sample filter's scan.

Usage: python tools/scale_pqd.py [--small 200000] [--large 6000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET_SAMPLE = 2_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=200_000)
    ap.add_argument("--large", type=int, default=6_000_000)
    args = ap.parse_args()
    from pyspark.sql import functions as F

    from mo_etl_spark.operators import similarity as S
    from mo_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_pqd")
    M, DSUB, KC = 4, 4, 16
    # arbitrary-but-fixed codebooks: distortion cost is independent of
    # book quality (k x dim broadcast either way)
    books = spark.createDataFrame(
        [
            (c, [float((c * 7 + d) % 11 - 5) for d in range(M * DSUB)])
            for c in range(KC)
        ],
        "cent_id BIGINT, vec ARRAY<DOUBLE>",
    ).localCheckpoint()
    out = []
    for scale, n in (("sf01", args.small), ("sf3", args.large)):
        df = (
            spark.range(n)
            .select(
                F.col("id").alias("c_id"),
                F.expr(
                    f"transform(sequence(1, {M * DSUB}),"
                    " i -> CAST(pmod(id * i, 13) AS DOUBLE))"
                ).alias("vec"),
            )
            .localCheckpoint()  # materialized input: measure the probe
        )
        mod = max(n // TARGET_SAMPLE, 1)
        best = None
        for _ in range(2):
            t0 = time.time()
            S.pq_distortion(df, books, M, DSUB, sample_mod=mod)
            sec = round(time.time() - t0, 3)
            best = sec if best is None or sec < best else best
        rec = {
            "op": "pq_distortion_probe", "scale": scale, "sec": best,
            "sample_mod": mod, "load": round(os.getloadavg()[0], 1),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    r = {o["scale"]: o["sec"] for o in out}
    print(json.dumps({"ratio30": round(r["sf3"] / r["sf01"], 2)}))


if __name__ == "__main__":
    main()
