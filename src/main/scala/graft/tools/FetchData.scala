package graft.tools

import java.nio.file.Paths

/** CLI twin of the reference's `scripts/fetch_data.py`: download one source
  * file into the raw layer, idempotently (skip when present, atomic move on
  * success). This is the `fetch_data` task of the scheduled DAG
  * (`dags/graft_etl_daily.py`); no SparkSession — it is pure ingest I/O.
  *
  * Usage: runMain graft.tools.FetchData <url> <destPath>
  */
object FetchData {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: FetchData <url> <destPath>")
    val Array(url, dest) = args
    val fetched = graft.sources.HttpFetch.fetchIfMissing(url, Paths.get(dest))
    println(if (fetched) s"fetched $url -> $dest" else s"exists, skipped: $dest")
  }
}
