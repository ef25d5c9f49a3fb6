package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare — and
  * fingerprints.json, a deterministic per-query result hash that gives the
  * oracle-less queries (crawl/streaming/connector/approximate — their
  * inputs never touch the oracle's parquet) a driver-visible cross-run
  * regression tripwire. */
object Verify {

  /** Order-insensitive-input, order-sensitive-content fingerprint: rows
    * are canonically sorted by their full string form, then hashed WITH
    * their rank, so any change in row content, multiplicity, or count
    * moves the hash while physical partitioning cannot. Deterministic
    * across runs and parallelism levels for deterministic query results
    * (asserted in SparkEntrySpec). */
  def fingerprint(df: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.expressions.Window
    val canonical = df.select(
      concat_ws("\u0001", df.columns.sorted.map(c =>
        // concat_ws SKIPS nulls even with a separator - sentinel them so a
        // value sliding between a null and a non-null column moves the
        // hash; the \u0001 separator keeps column BOUNDARIES in the hash
        // too (("1","23") must not fingerprint like ("12","3"))
        coalesce(col(c).cast("string"), lit("\u0000"))): _*).as("_row"))
    val ranked = canonical.withColumn("_rk",
      row_number().over(Window.orderBy(col("_row"))))
    // 32-bit folds summed: ANSI-safe below ~2^31 rows, content+order sensitive
    val r = ranked.select(
      sum(shiftrightunsigned(xxhash64(col("_row"), col("_rk")), 32)).as("h"),
      count(lit(1)).as("n")).collect()(0)
    (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val fingerprints = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    // builder-iteration knob (unset in driver runs): restrict to a
    // comma-separated query subset, e.g. SPARK_GRAFT_ONLY=q76_bpe_learn
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        fingerprints(name) = fingerprint(spark.read.parquet(s"$outDir/$name"))
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(s"$outDir/fingerprints.json"),
      fingerprints.map { case (k, (h, n)) => s""""$k": {"hash": $h, "rows": $n}""" }
        .mkString("{", ",\n ", "}"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
