#!/usr/bin/env python
"""Round-6 measurement harness (bench.py is FROZEN for measurement; this
file holds the extra instrumentation the optimization round needs).

Usage:
    python bench_extra.py q <name> [name...]   # time queries, n>=2 samples
    python bench_extra.py plans [name...]      # dump explain("formatted")
    python bench_extra.py all                  # time every declared query

Methodology matches bench.py's query phase: one warm session at
SPARK_GRAFT_CPUS cores, warmup of the worker pool / streaming engine,
`collect()` timed, library caches released between samples, min over
samples reported (host carries exogenous load).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from sketchlib.caches import release_caches  # noqa: E402
from sketchlib.session import get_spark  # noqa: E402


def make_session():
    import __spark_entry__ as mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", cores=cpus)
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for wname in ("hll_distinct_users_per_event_type", "media_decode",
                  "streaming_state_equivalence"):
        try:
            mod.queries()[wname](spark, warm_dir).collect()
        except Exception:
            pass
    try:
        mod._events_stream_src(spark, sf_dir, mod._t(spark, sf_dir, "events"))
        docs = mod._words(mod._t(spark, sf_dir, "documents")).select("doc_id", "words")
        mod._cached_stream_src(
            "ndstream_src", sf_dir, "documents.parquet",
            lambda b: docs.repartition(4).write.mode("overwrite").parquet(b),
        )
    except Exception:
        pass
    release_caches()
    return mod, spark, sf_dir


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = sys.argv[2:]
    mod, spark, sf_dir = make_session()
    qfns = mod.queries()
    if mode == "plans":
        os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
        suffix = os.environ.get("PLAN_SUFFIX", "before")
        for name in names or list(qfns):
            try:
                df = qfns[name](spark, sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception as e:
                txt = f"ERROR building plan: {type(e).__name__}: {e}"
            out = os.path.join(REPO, "plans", "r06", f"{name}_{suffix}.txt")
            with open(out, "w") as f:
                f.write(txt)
            release_caches()
            print("wrote", out)
        return
    if mode == "all":
        names = list(qfns)
    n_samples = int(os.environ.get("BX_SAMPLES", "2"))
    out: dict = {}
    for name in names:
        samples = []
        for _ in range(n_samples):
            t0 = time.time()
            try:
                qfns[name](spark, sf_dir).collect()
                samples.append(round(time.time() - t0, 2))
            except Exception as e:
                out[name] = f"ERROR: {type(e).__name__}: {e}"
                break
            finally:
                release_caches()
        if samples:
            out[name] = {"min": min(samples), "samples": samples,
                         "load": round(os.getloadavg()[0], 1)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
