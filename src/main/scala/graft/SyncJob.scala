package graft

import graft.streaming.Sync
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's user-facing surface: a configured, periodic,
  * bidirectional sync. The reference is driven by a YAML file naming the
  * two stores and an interval (SURVEY §3.1); [[SyncConfig]] is that config
  * re-expressed for the parquet-backed endpoints of this harness, and
  * [[SyncJob]] is the running loop — initial full sync + incremental
  * rounds, exactly-once effect via checkpoints, last-write-wins with
  * tombstone deletes.
  *
  * A user of the reference maps their config onto this one-to-one:
  * contact-points/keyspace/table → `sideA`, ES URL/index → `sideB`,
  * `sync_interval` → `interval`; the update-timestamp column the reference
  * reads from WRITETIME()/`_timestamp` is the `ts` column here.
  */
final case class SyncConfig(
    sideA: String,            // change-feed directory of store A
    sideB: String,            // change-feed directory of store B
    snapshotA: String,        // merged snapshot A maintains of B's data
    snapshotB: String,        // merged snapshot B maintains of A's data
    checkpointDir: String,
    interval: Trigger = Trigger.AvailableNow(),
    formatA: String = "parquet",   // feed format: parquet | graft-sync
    formatB: String = "parquet")

object SyncConfig {

  /** Load a reference-shaped YAML sync config (SURVEY §3.1: the reference
    * is driven by a YAML file naming the two stores and an interval):
    *
    * {{{
    * cassandra:                 # store A
    *   feed: /data/feedA        # change feed (stands in for keyspace/table)
    *   snapshot: /data/snapA    # merged view A maintains of B's data
    * elasticsearch:             # store B
    *   feed: /data/feedB        # change feed (stands in for the ES index)
    *   snapshot: /data/snapB
    * checkpoint_dir: /data/ckpt
    * sync_interval: 30          # seconds; 0 or absent = one-shot (AvailableNow)
    * }}}
    *
    * The parser is a deliberate two-level YAML subset (sections, scalar
    * `key: value` pairs, `#` comments, optional quotes) — the whole config
    * grammar the reference uses — so the engine stays dependency-free. */
  def load(path: String): SyncConfig =
    fromYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  def fromYaml(yaml: String): SyncConfig = {
    val flat = parseFlat(yaml)
    def req(k: String): String = flat.getOrElse(k,
      throw new IllegalArgumentException(
        s"sync config missing '$k' (have: ${flat.keys.toSeq.sorted.mkString(", ")})"))
    val interval = flat.get("sync_interval").map { v =>
      try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"sync config 'sync_interval' must be whole seconds, got '$v'")
      }
    } match {
      case Some(n) if n > 0 => Trigger.ProcessingTime(n * 1000L)
      case _                => Trigger.AvailableNow()
    }
    SyncConfig(
      sideA = req("cassandra.feed"),
      sideB = req("elasticsearch.feed"),
      snapshotA = req("cassandra.snapshot"),
      snapshotB = req("elasticsearch.snapshot"),
      checkpointDir = req("checkpoint_dir"),
      interval = interval,
      // optional per-side feed format: the parquet harness default,
      // `graft-sync` (the paged-endpoint stand-in), or the REAL wires —
      // `graft-cql` (feed: cql://host:port/ks/table?pk=<col>) and
      // `graft-es` (feed: es://host:port/index) — the reference's actual
      // contact-points/keyspace/table and ES-URL/index config lines
      formatA = flat.getOrElse("cassandra.format", "parquet"),
      formatB = flat.getOrElse("elasticsearch.format", "parquet"))
  }

  /** Two-level YAML subset → flat "section.key" map. Unknown keys pass
    * through (forward-compatible); nesting deeper than one level, flow
    * collections, and multi-line scalars are out of grammar and rejected
    * by the missing-key check above rather than silently misread. */
  private def parseFlat(yaml: String): Map[String, String] = {
    var section = ""
    val out = Map.newBuilder[String, String]
    yaml.linesIterator.foreach { raw =>
      // a '#' starts a comment only when preceded by whitespace (or at
      // line start) and outside double quotes — YAML's actual rule, so a
      // value like /data/snap#prod survives while `key: "v"  # note`
      // strips cleanly
      val noComment = {
        var inQ = false
        var cut = raw.length
        var i = 0
        while (i < raw.length && cut == raw.length) {
          raw.charAt(i) match {
            case '"' => inQ = !inQ
            case '#' if !inQ &&
                (i == 0 || raw.charAt(i - 1) == ' ' || raw.charAt(i - 1) == '\t') =>
              cut = i
            case _ => ()
          }
          i += 1
        }
        raw.substring(0, cut)
      }
      val line = noComment.replaceAll("\\s+$", "")
      if (line.trim.nonEmpty) {
        val indented = line.head == ' ' || line.head == '\t'
        line.trim.split(":", 2) match {
          case Array(k, rest) =>
            val v = rest.trim.stripPrefix("\"").stripSuffix("\"")
            if (v.isEmpty && !indented) section = k.trim
            // an indented key with an empty value is the start of a
            // deeper-nested block — out of grammar; store NOTHING so the
            // missing-key check reports it instead of silently reading ""
            else if (v.nonEmpty)
              out += (if (indented && section.nonEmpty) s"$section.${k.trim}"
                      else k.trim) -> v
          case _ => // bare scalar line: out of grammar, ignore
        }
      }
    }
    out.result()
  }
}

object SyncJob {

  /** Start the bidirectional loop: each side's change feed is LWW-merged
    * into the opposite snapshot. Returns both running queries. */
  def start(spark: SparkSession, cfg: SyncConfig): (StreamingQuery, StreamingQuery) = {
    val aToB = Sync.lwwSink(
      changeFeed(spark, cfg.sideA, cfg.formatA),
      cfg.snapshotB, s"${cfg.checkpointDir}/a2b", cfg.interval)
    val bToA = Sync.lwwSink(
      changeFeed(spark, cfg.sideB, cfg.formatB),
      cfg.snapshotA, s"${cfg.checkpointDir}/b2a", cfg.interval)
    (aToB, bToA)
  }

  /** One side's change feed as a stream in [[Sync.changeSchema]] shape.
    * `graft-sync` feeds carry `ts` as epoch-micros longs (the connector's
    * value domain) and are re-homed to TimestampType here, so every
    * downstream operator sees one schema regardless of the endpoint. */
  private def changeFeed(spark: SparkSession, dir: String,
      format: String): org.apache.spark.sql.DataFrame = format match {
    case "parquet" => Sync.changeStream(spark, dir)
    case "graft-sync" =>
      spark.readStream.format("graft-sync").load(dir)
        .withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts)"))
        .select("key", "ts", "uid", "payload")
    case "graft-cql" =>
      // the REAL wire: feed = cql://host:port/keyspace/table?pk=<col>;
      // the change feed polls by the ts column (epoch-µs bigint) —
      // exactly the reference's poll-by-update-timestamp rounds
      val u = new java.net.URI(dir)
      require(u.getScheme == "cql",
        s"graft-cql feed must be cql://host:port/ks/table?pk=..., got $dir")
      val Array(ks, tbl) = u.getPath.stripPrefix("/").split("/")
      val pk = uriParam(u, "pk").getOrElse(throw new IllegalArgumentException(
        s"graft-cql feed needs ?pk=<partition key column>: $dir"))
      spark.readStream.format("graft-cql")
        .option("host", s"${u.getHost}:${u.getPort}")
        .option("keyspace", ks).option("table", tbl)
        .option("partition-key", pk)
        .option("incremental-column", "ts")
        .load()
        .withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts)"))
        .select("key", "ts", "uid", "payload")
    case "graft-es" =>
      // the REAL wire: feed = es://host:port/index (http assumed — the
      // harness stub; a TLS deployment would extend the scheme)
      val u = new java.net.URI(dir)
      require(u.getScheme == "es",
        s"graft-es feed must be es://host:port/index, got $dir")
      spark.readStream.format("graft-es")
        .option("nodes", s"http://${u.getHost}:${u.getPort}")
        .option("index", u.getPath.stripPrefix("/"))
        .option("incremental-column", "ts")
        .load()
        .withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts)"))
        .select("key", "ts", "uid", "payload")
    case other => throw new IllegalArgumentException(
      s"sync config: unknown feed format '$other' " +
        "(parquet | graft-sync | graft-cql | graft-es)")
  }

  private def uriParam(u: java.net.URI, key: String): Option[String] =
    Option(u.getQuery).flatMap(_.split("&").collectFirst {
      case kv if kv.startsWith(s"$key=") => kv.stripPrefix(s"$key=")
    })

  /** One batch round (the reference's non-streaming mode): read whatever
    * is in both feeds now, merge both directions once, return row counts. */
  def runOnce(spark: SparkSession, cfg: SyncConfig): (Long, Long) = {
    val (qa, qb) = start(spark, cfg)
    try { qa.processAllAvailable(); qb.processAllAvailable() }
    finally { qa.stop(); qb.stop() }
    val a = spark.read.schema(Sync.changeSchema).parquet(cfg.snapshotA).count()
    val b = spark.read.schema(Sync.changeSchema).parquet(cfg.snapshotB).count()
    (a, b)
  }
}
