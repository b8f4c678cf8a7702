package graft.tools

/** Regenerates `bench_keys.json` — the committed sidecar mapping the bench
  * line's short aliases back to full query keys (see [[graft.Bench.aliasMap]]
  * for the scheme and why the line needs aliases at all). Run:
  * `sbt 'runMain graft.tools.BenchKeys'` after adding queries; ContractSpec
  * fails until the committed file matches.
  */
object BenchKeys {
  def json: String = {
    val m = graft.Bench.aliasMap(graft.SparkEntry.queries.keys.toSeq)
    val body = m.toSeq.sortBy(_._2).map { case (full, a) =>
      s"""  "$a": "$full"""" }.mkString(",\n")
    "{\n  \"_\": \"BENCH_r*.json query-key aliases -> full query keys; " +
      "regenerate: sbt 'runMain graft.tools.BenchKeys'\",\n" + body + "\n}\n"
  }

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "bench_keys.json")
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $out")
  }
}
