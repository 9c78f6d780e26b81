package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions._

/** SQL surface for the engine's custom expressions: registers them in the
  * session FunctionRegistry so `spark.sql` queries (and the thin SQL front
  * door of SURVEY §7.1) can call them directly:
  *
  *   vec_dot(a, b)            — codegen'd dot product (similarity plane)
  *   shingle_hashes(tokens,n) — distinct word-n-gram xxhash64 set
  *   minhash_sig(hashes, k)   — MinHash signature
  *   jaccard_sim(a, b)        — Jaccard over hash arrays
  *   simhash64(tokens)        — 64-bit SimHash
  *   token_fingerprint(tokens)— md5 of sorted distinct token set
  *   heavy_hitters(item[,cap])— Misra–Gries top-frequency summary (aggregate)
  *   bloom_agg(item[,m[,k]])  — bloom-filter bytes over a group (aggregate)
  *   bloom_might_contain(b,x) — membership probe against bloom_agg bytes
  *
  * Registered either per-session via [[GraftFunctions.register]] or for all
  * sessions via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = longArg(e, name) match {
    case v if v >= Int.MinValue && v <= Int.MaxValue => v.toInt
    case v => throw new IllegalArgumentException(s"$name must fit in an int, got $v")
  }

  private def longArg(e: Expression, name: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$name must be an integer literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "shingle_hashes" -> (es => ShingleHashes(es(0), if (es.length > 1) intArg(es(1), "n") else 3)),
    "minhash_sig" -> (es => MinHashSig(es(0), if (es.length > 1) intArg(es(1), "k") else 32)),
    "jaccard_sim" -> (es => JaccardSim(es(0), es(1))),
    "simhash64" -> (es => SimHash64(es(0))),
    "token_fingerprint" -> (es => TokenSetFingerprint(es(0))),
    "winnow_fingerprints" -> (es => WinnowingFingerprints(es(0),
      if (es.length > 1) intArg(es(1), "k") else 8,
      if (es.length > 2) intArg(es(2), "w") else 16)),
    // aggregate: the analyzer wraps a bare AggregateFunction in
    // AggregateExpression (same as the built-in registry entries)
    "heavy_hitters" -> (es => HeavyHittersAgg(es(0),
      if (es.length > 1) intArg(es(1), "capacity") else 64)),
    "bloom_agg" -> (es => BloomFilterAgg(es(0),
      if (es.length > 1) longArg(es(1), "numBits") else 1L << 20,
      if (es.length > 2) intArg(es(2), "numHashes") else 5)),
    "bloom_might_contain" -> (es => BloomMightContain(es(0), es(1))))

  /** Register all graft functions as temp functions in this session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `SparkSessionExtensions` hook (SURVEY §7: register via
  * `.withExtensions(new GraftExtensions)` or the `spark.sql.extensions`
  * conf) — injects the engine's functions into every session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (es: Seq[Expression]) => builder(es)))
    }
}
