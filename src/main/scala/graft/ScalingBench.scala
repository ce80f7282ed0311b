package graft

/**
 * Two-cluster-size scaling evidence (BASELINE.json north_rule; no real
 * cluster in the sandbox, so N vs 4N executors is proxied by local[8] vs
 * local[32] on the SAME input): run the flagship spatial join + tile
 * assignment at both parallelism levels, report throughput at each and
 * efficiency = (throughput@32 / throughput@8) / 4.
 *
 * Usage: runMain graft.ScalingBench [sfDir] [amplify] [repeats]
 * Prints one JSON line; BENCH.md records the round's numbers.
 */
object ScalingBench {

  def measure(cpus: Int, sfDir: String, amplify: Int, repeats: Int):
      (Long, Double, Double, Long, Double) = {
    val spark = Bench.session(cpus.toString)
    try {
      // warmup runs (JIT the same generated code: identical plan constants)
      Bench.flagship(spark, sfDir, amplify, parts = cpus * 4)
      Bench.flagshipDense(spark, sfDir, amplify / 10, parts = cpus * 4)
      var bestJoin = Double.MaxValue
      var bestTile = Double.MaxValue
      var bestDense = Double.MaxValue
      var nPages = 0L; var nDense = 0L
      (0 until repeats).foreach { _ =>
        val (np, js, ts, _) = Bench.flagship(spark, sfDir, amplify, parts = cpus * 4)
        nPages = np
        bestJoin = Math.min(bestJoin, js)
        bestTile = Math.min(bestTile, ts)
        val (nd, ds, _) = Bench.flagshipDense(spark, sfDir, amplify / 10, parts = cpus * 4)
        nDense = nd
        bestDense = Math.min(bestDense, ds)
      }
      (nPages, nPages / bestJoin, nPages / bestTile, nDense, nDense / bestDense)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val amplify = if (args.length > 1) args(1).toInt else 40000
    val repeats = if (args.length > 2) args(2).toInt else 3
    val (n8, join8, tile8, d8, dense8) = measure(8, sfDir, amplify, repeats)
    val (n32, join32, tile32, d32, dense32) = measure(32, sfDir, amplify, repeats)
    require(n8 == n32 && d8 == d32, "same input required at both parallelism levels")
    val joinEff = (join32 / join8) / 4.0
    val tileEff = (tile32 / tile8) / 4.0
    val denseEff = (dense32 / dense8) / 4.0
    println(
      s"""{"metric":"scaling","pages":$n8,"dense_pages":$d8,"sf":"$sfDir","amplify":$amplify,""" +
        s""""join_pages_per_sec_8":${join8.toLong},"join_pages_per_sec_32":${join32.toLong},""" +
        s""""join_scaling_efficiency":${"%.3f".format(joinEff)},""" +
        s""""dense_join_pages_per_sec_8":${dense8.toLong},"dense_join_pages_per_sec_32":${dense32.toLong},""" +
        s""""dense_join_scaling_efficiency":${"%.3f".format(denseEff)},""" +
        s""""tile_pages_per_sec_8":${tile8.toLong},"tile_pages_per_sec_32":${tile32.toLong},""" +
        s""""tile_scaling_efficiency":${"%.3f".format(tileEff)}}""")
  }
}
