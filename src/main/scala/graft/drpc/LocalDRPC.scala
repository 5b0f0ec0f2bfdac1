package graft.drpc

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** DRPC-analog query service — the reference's "interactive query" entry
  * point re-expressed Spark-side (SURVEY.md §2.11, §3.3).
  *
  * In the reference, `client.execute(function, args)` routes a request
  * through a running topology (one micro-batch per request:
  * `newDRPCStream` → pipeline → `stateQuery` → `ReturnResultsReducer` joins
  * results back to the caller, `TridentTopology.java:135-157,428-449`;
  * daemon `clj/backtype/storm/daemon/drpc.clj:48-123`). On Spark the
  * pipeline is a parameterized DataFrame query over materialized state, run
  * on demand — the DataFrame plan IS the registered topology fragment.
  *
  * This in-process implementation mirrors `LocalDRPC`
  * (`clj/backtype/storm/LocalDRPC.clj`), the fixture the reference's own
  * integration tests use (`integration_test.clj:55-86`). Results are
  * returned as the reference wire format: a JSON list of result tuples.
  */
class LocalDRPC(spark: SparkSession) {
  // concurrent: DRPCService worker threads call execute() while the app
  // may still be registering functions — a plain mutable.Map races
  private val functions =
    scala.collection.concurrent.TrieMap[String, String => DataFrame]()
  // keyed fast path (VERDICT r13 #1): wire-format results straight from
  // driver memory — no DataFrame, no Spark job. A name registered both
  // ways serves through the fast face (the job face remains reachable via
  // executeDF for parity checks). A fast function returns None when it
  // cannot answer authoritatively (an EVICTING StateIndex missed —
  // VERDICT r14 #2): the request then reads through to the job path,
  // the CachedMap cache-miss discipline.
  private val fastFunctions =
    scala.collection.concurrent.TrieMap[String, String => Option[String]]()

  /** Register a named query pipeline: args → DataFrame plan. */
  def register(name: String, fn: String => DataFrame): Unit =
    functions(name) = fn

  /** Register a FAST function: args → DRPC wire-format JSON, served
    * inline on the calling thread (the reference's millisecond `MapGet`
    * contract — `DRPCSpout.java:101-143` against in-memory state). Use
    * [[registerMapGet]]/[[registerSnapshotGet]] for the common keyed
    * shapes over a [[StateIndex]]. */
  def registerFast(name: String, fn: String => String): Unit =
    fastFunctions(name) = (args => Some(fn(args)))

  /** Register a PARTIAL fast function: `None` means "not servable from
    * driver memory — read through to the job-path registration". */
  def registerFastPartial(name: String, fn: String => Option[String]): Unit =
    fastFunctions(name) = fn

  /** Whether `name` serves through the fast path. */
  def isFast(name: String): Boolean = fastFunctions.contains(name)

  /** Fast-path attempt: None if no fast registration, or the fast
    * function declined (cache miss on an evicting index). */
  def tryFast(name: String, args: String): Option[String] =
    fastFunctions.get(name).flatMap(fn => fn(args))

  /** `MapGet` over a driver-held [[StateIndex]]: args (via `key`) → the
    * indexed value as a one-tuple result list, `[]` when absent — the
    * same wire shape the job-path `stateQuery` + collect produces for a
    * single-key filter. On a non-evicting index a miss IS the answer
    * (`[]`); once the index has evicted, a miss is ambiguous and the
    * request falls through to the job-path registration of the same
    * name (identical result, one Spark job — spec-pinned parity). */
  def registerMapGet[K, V](name: String, index: StateIndex[K, V],
                           key: String => K): Unit =
    registerFastPartial(name, args => index.get(key(args)) match {
      case Some(v) => Some("[[" + jsonValue(v) + "]]")
      case None => if (index.isAuthoritative) Some("[]") else None
    })

  /** `SnapshotGet` over a [[StateIndex]] holding a single global slot
    * (the `$GLOBAL$` snapshot shape, q18's semantics): ignores args,
    * returns the slot's value. */
  def registerSnapshotGet[K, V](name: String, index: StateIndex[K, V],
                                slot: K): Unit =
    registerFastPartial(name, _ => index.get(slot) match {
      case Some(v) => Some("[[" + jsonValue(v) + "]]")
      case None => if (index.isAuthoritative) Some("[]") else None
    })

  def executeDF(name: String, args: String): DataFrame = {
    val fn = functions.getOrElse(name,
      throw new IllegalArgumentException(s"unknown DRPC function: $name"))
    fn(args)
  }

  /** `execute(function, args)` → JSON-encoded list of result tuples, the
    * DRPC wire format (`ReturnResults.java:40-44`). Fast-registered
    * functions answer inline from driver memory (falling through to the
    * job path on a declined fast attempt — evicting-index cache miss);
    * everything else runs its DataFrame plan as a Spark job. */
  def execute(name: String, args: String): String =
    tryFast(name, args).getOrElse {
      val rows = executeDF(name, args).collect()
      rows.map(r => r.toSeq.map(jsonValue).mkString("[", ",", "]"))
        .mkString("[", ",", "]")
    }

  /** `trident/testing/TuplifyArgs.java:26-34` — parse JSON-array DRPC args
    * into tuples: `[["a"],["b",...]]` → one row per inner array, columns
    * named by `fields` (string-typed, like the reference's dynamic tuples). */
  def tuplifyArgs(args: String, fields: Seq[String]): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    val rows = spark.range(1).select(
      F.explode(F.from_json(F.lit(args),
        org.apache.spark.sql.types.DataType.fromDDL("array<array<string>>"))).as("__t"))
    rows.select(fields.zipWithIndex.map { case (f, i) =>
      F.col("__t").getItem(i).as(f)
    }: _*)
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case d: java.lang.Double if d.isNaN || d.isInfinite => "null" // JSON has no NaN/Inf
    case f: java.lang.Float if f.isNaN || f.isInfinite => "null"
    case n: java.lang.Number => n.toString
    case b: Boolean => b.toString
    case other => jsonValue(other.toString)
  }
}
