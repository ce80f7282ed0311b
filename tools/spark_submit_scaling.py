#!/usr/bin/env python3
"""N -> 4N MULTI-EXECUTOR scaling via spark-submit + local-cluster mode.

Runs graft.ClusterBench twice — local-cluster[N,C,mem] and
local-cluster[4N,C,mem] (separate executor JVMs: real serialized
broadcasts, netty shuffle, per-executor heaps) — on the SAME input, and
reports throughput at both sizes plus raw and ceiling-normalized scaling
efficiency (the BENCH.md methodology: the pure-compute ceiling sample
each invocation prints normalizes out shared-host turbo/contention).

Usage: python3 tools/spark_submit_scaling.py [sfDir] [amplify] [repeats] \
         [execA] [execB] [coresPerExec]
Default topology pair: 2x4 -> 8x4 (8 -> 32 cores; the 4N side saturates
the 32-vCPU host — read the vs-ceiling numbers there). For a raw-
efficiency reading clear of host saturation use 1 4 2 (2 -> 8 cores).
Prerequisite: sbt -batch package (builds target/scala-2.13/*.jar).
"""
import glob, json, subprocess, sys

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def run(executors, cores, mem_mb, sf, amplify, repeats):
    jar = sorted(glob.glob("target/scala-2.13/*.jar"))[-1]
    cmd = [SPARK_SUBMIT,
           "--master", f"local-cluster[{executors},{cores},{mem_mb}]",
           "--conf", f"spark.sql.shuffle.partitions={executors * cores}",
           "--conf", "spark.driver.memory=4g",
           "--class", "graft.ClusterBench", jar,
           sf, str(amplify), str(repeats)]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if '"metric":"cluster_bench"' in line:
            return json.loads(line)
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:] + "\n")
    raise SystemExit(f"no cluster_bench line from local-cluster[{executors},{cores},{mem_mb}]")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 40000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    exec_a = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    exec_b = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    cores = int(sys.argv[6]) if len(sys.argv) > 6 else 4
    a = run(exec_a, cores, 4096, sf, amplify, repeats)
    b = run(exec_b, cores, 4096, sf, amplify, repeats)
    ratio = (b["executors"] * 1.0) / a["executors"] if a["executors"] else 4.0
    join_eff = (b["join_pages_per_sec"] / a["join_pages_per_sec"]) / ratio
    tile_eff = (b["tile_pages_per_sec"] / a["tile_pages_per_sec"]) / ratio
    # ceiling: pure-compute fold sped up by ceil_speedup going N -> 4N
    ceil_speedup = a["compute_ceiling_sec"] / b["compute_ceiling_sec"]
    ceil_eff = ceil_speedup / ratio
    print(json.dumps({
        "metric": "spark_submit_scaling",
        "sf": sf, "amplify": amplify,
        "a": a, "b": b,
        "executor_ratio": ratio,
        "join_scaling_efficiency": round(join_eff, 3),
        "tile_scaling_efficiency": round(tile_eff, 3),
        "host_compute_ceiling_efficiency": round(ceil_eff, 3),
        "join_efficiency_vs_ceiling": round(join_eff / ceil_eff, 3) if ceil_eff else None,
        "tile_efficiency_vs_ceiling": round(tile_eff / ceil_eff, 3) if ceil_eff else None,
    }))


if __name__ == "__main__":
    main()
