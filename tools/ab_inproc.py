"""In-process alternating A/B for registered queries under host noise.

Separate-JVM A/B runs are useless on a host with hypervisor steal-time
episodes (observed 2-3x run-to-run swings on identical code). This
harness runs BOTH variants of a query inside ONE warmed JVM, strictly
alternating A/B/A/B..., so slow episodes hit both arms equally; the
reported per-arm MIN is then comparable. Variants toggle via an env var
the code under test reads per call.

Usage:
    python tools/ab_inproc.py ENVVAR A_VALUE B_VALUE q1,q2,... [--reps 4] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    envvar, a_val, b_val, names = sys.argv[1:5]
    reps = 4
    sf_dir = "/root/testdata/sf0.1"
    argv = sys.argv[5:]
    for i, a in enumerate(argv):
        if a == "--reps":
            reps = int(argv[i + 1])
        if a == "--sf":
            sf_dir = argv[i + 1]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from databricks_demo_feature_store_spark import get_spark
    import bench

    QUERIES = bench._register_all()
    spark = get_spark("ab_inproc")
    qnames = [n for n in names.split(",") if n]

    for name in qnames:
        fn = QUERIES[name].fn
        # one discarded warm-up per arm
        for v in (a_val, b_val):
            os.environ[envvar] = v
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        res: dict[str, list[float]] = {a_val: [], b_val: []}
        for _ in range(reps):
            for v in (a_val, b_val):
                os.environ[envvar] = v
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                res[v].append(time.time() - t0)
        amin, bmin = min(res[a_val]), min(res[b_val])
        print(
            f"{name}: {envvar}={a_val} min={amin:.3f} {sorted(round(t,2) for t in res[a_val])} | "
            f"{envvar}={b_val} min={bmin:.3f} {sorted(round(t,2) for t in res[b_val])} | "
            f"B/A={bmin/amin:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
