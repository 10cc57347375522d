"""Targeted optimization probe (r11): time named registry queries with
the noop sink in one warmed session and dump their formatted plans.

Usage:
    python tools/opt_probe.py [--plans-dir plans/r11] [--tag before]
        [--passes 3] [--sf-dir /root/testdata/sf0.1]
        [--ab-ref <git ref>] name [name ...]

For each query: builds the DataFrame, writes explain("formatted") to
<plans-dir>/<name>_<tag>.txt (when --plans-dir given), then times
construct+noop-sink execution best-of-<passes>. Prints one JSON line
{name: {"best": s, "construct": s, "runs": [...]}}. Mirrors bench.py
methodology (same session conf, same untimed warm) so numbers are
comparable to the bench's per-query map.

--ab-ref runs the SAME-SESSION alternating A/B protocol from
``bench.py --ab`` (module swap per side, one untimed warm pass per
side, alternating lead, best-of-<passes>) restricted to the named
queries — the only noise-robust comparison on this virtualized host,
where identical code re-probed across sessions swings >2x.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_neotel_sql_automation_spark import workload
from etl_neotel_sql_automation_spark.session import get_spark


def _warm_session(spark, qs, sf_dir) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    qs["sort_topk_orders"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    warm = F.pandas_udf(lambda s: s * 1.0, returnType=T.DoubleType())
    spark.range(1000).select(warm(F.col("id").cast("double"))).write.mode(
        "overwrite"
    ).format("noop").save()


def ab_main(ref: str, names: list[str], passes: int, sf_dir: str) -> None:
    """Same-session alternating A/B over arbitrary query names — the
    bench.py --ab protocol without the frozen-set restriction."""
    import subprocess

    import bench as B

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sha = subprocess.run(
        ["git", "-C", repo, "rev-parse", ref],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    wt = f"/tmp/opt_ab_{sha[:12]}"
    # only remove the worktree in finally if THIS invocation created it
    # (r11 ADVICE: force-removing a pre-existing one deletes state a
    # concurrent/interrupted run may expect)
    created_wt = not os.path.isdir(wt)
    if created_wt:
        subprocess.run(
            ["git", "-C", repo, "worktree", "add", "--detach", wt, sha],
            check=True, capture_output=True,
        )
    spark = None
    try:
        old_qs, old_mods = B._load_queries_from(wt)
        new_qs = dict(workload.queries())
        new_mods = B._grab_modules()
        side_env = {"new": (repo, new_mods), "old": (wt, old_mods)}
        runnable = [n for n in names if n in old_qs and n in new_qs]
        spark = get_spark(app_name="opt-ab")
        _warm_session(spark, new_qs, sf_dir)
        best = {"new": dict.fromkeys(runnable, float("inf")),
                "old": dict.fromkeys(runnable, float("inf"))}
        for p in range(-1, passes):
            sides = [("new", new_qs), ("old", old_qs)]
            if p % 2:
                sides.reverse()
            for side, qmap in sides:
                root, mods = side_env[side]
                B._set_modules(mods)
                sys.path.insert(0, root)
                try:
                    for name in runnable:
                        t0 = time.perf_counter()
                        qmap[name](spark, sf_dir).write.mode("overwrite").format(
                            "noop"
                        ).save()
                        dt = time.perf_counter() - t0
                        if p >= 0 and dt < best[side][name]:
                            best[side][name] = dt
                finally:
                    side_env[side] = (root, B._grab_modules())
                    sys.path.remove(root)
            B._set_modules(side_env["new"][1])
        spark.stop()
        out = {
            n: {
                "new": round(best["new"][n], 3),
                "old": round(best["old"][n], 3),
                "ratio": round(best["new"][n] / best["old"][n], 4)
                if best["old"][n]
                else None,
            }
            for n in runnable
        }
        skipped = [n for n in names if n not in runnable]
        if skipped:
            out["_skipped"] = skipped
        print(json.dumps(out))
    finally:
        # stop the session BEFORE removing the worktree (r11 ADVICE: an
        # exception mid-A/B used to leak the Spark session), and only
        # remove the worktree this invocation created
        if spark is not None:
            try:
                spark.stop()
            except Exception:  # noqa: BLE001 - already-stopped session
                pass
        if created_wt:
            subprocess.run(
                ["git", "-C", repo, "worktree", "remove", "--force", wt],
                capture_output=True,
            )


def main() -> None:
    args = sys.argv[1:]

    def take(flag: str, default: str | None = None) -> str | None:
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    plans_dir = take("--plans-dir")
    tag = take("--tag", "before")
    ab_ref = take("--ab-ref")
    passes_arg = take("--passes")
    sf_dir = take("--sf-dir", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    names = args
    if not names:
        raise SystemExit("no query names given")
    if ab_ref:
        # A/B passes default to an EVEN count (r11 ADVICE): the
        # alternating protocol's lead-order debiasing needs each side
        # to lead equally often; an odd count re-introduces the bias
        # bench.py --ab documents. Odd explicit counts are rounded up.
        passes = int(passes_arg) if passes_arg else 4
        if passes % 2:
            passes += 1
            print(f"# --ab-ref with odd passes re-biases lead order; using {passes}")
        ab_main(ab_ref, names, passes, sf_dir)
        return
    passes = int(passes_arg) if passes_arg else 3

    spark = get_spark(app_name="opt-probe")
    qs = dict(workload.queries())
    for n in names:
        if n not in qs:
            raise SystemExit(f"unknown query: {n}")

    # untimed warm (bench.py convention): codegen + python worker pool
    _warm_session(spark, qs, sf_dir)

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"opt_probe:{name}")
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        runs: list[float] = []
        constructs: list[float] = []
        for _ in range(passes):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            runs.append(round(t2 - t0, 3))
            constructs.append(round(t1 - t0, 3))
        best_i = min(range(passes), key=lambda i: runs[i])
        out[name] = {
            "best": runs[best_i],
            "construct": constructs[best_i],
            "runs": runs,
        }
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
