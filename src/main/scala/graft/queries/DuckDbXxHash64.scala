package graft.queries

/** Generates DuckDB SQL that reproduces Spark's `xxhash64(...)` (seed 42)
  * bit-for-bit, so the MinHash/LSH dedup queries (q23/q50) can graduate from
  * rows-only checks to full DuckDB hash oracles.
  *
  * DuckDB has no xxhash64 and its BIGINT arithmetic raises on overflow, so
  * the XXH64 state machine is emitted as HUGEINT (128-bit) modular
  * arithmetic: 64×64-bit multiplies are split into 32-bit halves
  * (a·c mod 2^64 = (alo·clo + ((alo·chi + ahi·clo) mod 2^32)·2^32) mod 2^64 —
  * every partial product stays below 2^66, far inside HUGEINT), rotations
  * and shifts become division/multiplication by powers of two, and xor is
  * DuckDB's native HUGEINT `xor`. All multiplies in XXH64 are by constant
  * primes, so each expansion folds one operand to literals.
  *
  * The emitted SQL is a CTE chain evaluated once per (doc, shingle) row:
  * bytes from `upper(hex(encode(s)))` (DuckDB hex is uppercase), 8-byte
  * little-endian words, the 32-byte-stripe accumulator loop as a
  * `list_reduce` over `[v1,v2,v3,v4]` states, then the standard 8/4/1-byte
  * tails and the avalanche. Verified against `xxhash64` outputs from Spark
  * for empty/short/32-aligned/unaligned/multibyte-UTF-8 inputs and against
  * the full q23 pair set at sf0.01.
  *
  * This object builds ORACLE text only — it is never part of a Spark plan.
  */
object DuckDbXxHash64 {
  private val M64 = BigInt(1) << 64
  private val M32 = BigInt(1) << 32
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)
  private val Seed = BigInt(42)

  /** (a * c) mod 2^64 for a variable SQL operand in [0, 2^64) and a constant. */
  private def mul(a: String, c: BigInt): String = {
    val clo = c % M32
    val chi = c >> 32
    s"(((($a) % $M32) * $clo + (((($a) % $M32) * $chi + (($a) // $M32) * $clo) % $M32) * $M32) % $M64)"
  }

  private def rotl(x: String, r: Int): String = {
    val lo = BigInt(1) << (64 - r)
    s"(((($x) % $lo) * ${BigInt(1) << r}) + (($x) // $lo))"
  }

  private def add(a: String, b: String): String = s"((($a) + ($b)) % $M64)"
  private def xor(a: String, b: String): String =
    s"xor(CAST(($a) AS HUGEINT), CAST(($b) AS HUGEINT))"
  private def shr(x: String, r: Int): String = s"(($x) // ${BigInt(1) << r})"

  /** XXH64 round: rotl(acc + input·P2, 31)·P1, all mod 2^64. */
  private def rnd(acc: String, inp: String): String =
    mul(rotl(add(acc, mul(inp, P2)), 31), P1)

  private def merge(h: String, v: String): String =
    add(mul(xor(h, rnd("0::HUGEINT", v)), P1), P4.toString)

  private def avalanche(h: String): String = {
    val h1 = xor(h, shr(h, 33))
    val h2 = mul(h1, P2)
    val h3 = xor(h2, shr(h2, 29))
    val h4 = mul(h3, P3)
    xor(h4, shr(h4, 32))
  }

  private val Hex = "'0123456789ABCDEF'"

  private def byteList: String =
    s"list_transform(range(1, n+1), i -> CAST((strpos($Hex, substring(hx, 2*i-1, 1))-1)*16" +
      s" + strpos($Hex, substring(hx, 2*i, 1))-1 AS HUGEINT))"

  private def wordList: String = {
    val terms = (0 until 8).map(j => s"b[8*k-${7 - j}] * ${BigInt(1) << (8 * j)}").mkString(" + ")
    s"list_transform(range(1, n//8+1), k -> $terms)"
  }

  private val V1 = (Seed + P1 + P2) % M64
  private val V2 = (Seed + P2) % M64
  private val V3 = Seed
  private val V4 = (Seed - P1 + M64) % M64

  private def stripeReduce: String = {
    val stripes = "list_transform(range(1, n//32+1), k -> [w[4*k-3], w[4*k-2], w[4*k-1], w[4*k]])"
    val lam = "(a, x) -> [" + (1 to 4).map(i => rnd(s"a[$i]", s"x[$i]")).mkString(", ") + "]"
    val init = s"[$V1::HUGEINT, $V2::HUGEINT, $V3::HUGEINT, $V4::HUGEINT]"
    s"list_reduce(list_prepend($init, $stripes), $lam)"
  }

  private def bigH: String = {
    val s0 = add(add(rotl("st[1]", 1), rotl("st[2]", 7)), add(rotl("st[3]", 12), rotl("st[4]", 18)))
    (1 to 4).foldLeft(s0)((h, i) => merge(h, s"st[$i]"))
  }

  private def tail8Reduce: String = {
    val step = add(mul(rotl(xor("a", rnd("0::HUGEINT", "x")), 27), P1), P4.toString)
    s"list_reduce(list_prepend(h5, list_transform(range(4*(n//32)+1, n//8+1), k -> w[k])), (a, x) -> $step)"
  }

  private def word4: String =
    "(" + (0 until 4).map(j => s"b[8*(n//8)+${j + 1}] * ${BigInt(1) << (8 * j)}").mkString(" + ") + ")"

  private def tail4Step: String =
    add(mul(rotl(xor("h6", mul(word4, P1)), 23), P2), P3.toString)

  private def tailByteReduce: String = {
    val step = mul(rotl(xor("a", mul("x", P5)), 11), P1)
    val start = "8*(n//8) + (CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END)"
    s"list_reduce(list_prepend(h7, list_transform(range($start+1, n+1), k -> b[k])), (a, x) -> $step)"
  }

  /** CTE chain (names {p}1..{p}9, default xh1..xh9) computing
    * `xxh` = xxhash64(strcol) as a signed BIGINT for every row of `src`,
    * carrying `keep` columns through. Splice after a `WITH`: the caller
    * continues from relation `{p}9` (columns: keep ++ (s, xxh)). Pass a
    * distinct `prefix` to splice TWO chains into one query (e.g. token
    * bucketing + id-keyed sampling in the DSIR-resample oracle).
    */
  def xxh64Cte(src: String, strcol: String, keep: Seq[String],
      prefix: String = "xh"): String = {
    val k = if (keep.isEmpty) "" else keep.mkString(", ") + ", "
    val p = prefix
    val smallInit = (Seed + P5) % M64
    s"""${p}1 AS (SELECT $k$strcol AS s, upper(hex(encode($strcol))) AS hx,
       |        octet_length(encode($strcol)) AS n FROM $src),
       |${p}2 AS (SELECT ${k}s, n, $byteList AS b FROM ${p}1),
       |${p}3 AS (SELECT ${k}s, n, b, $wordList AS w FROM ${p}2),
       |${p}4 AS (SELECT ${k}s, n, b, w,
       |        CASE WHEN n >= 32 THEN $stripeReduce ELSE NULL END AS st FROM ${p}3),
       |${p}5 AS (SELECT ${k}s, n, b, w,
       |        ((CASE WHEN n >= 32 THEN $bigH ELSE $smallInit::HUGEINT END) + n) % $M64 AS h5 FROM ${p}4),
       |${p}6 AS (SELECT ${k}s, n, b, w, $tail8Reduce AS h6 FROM ${p}5),
       |${p}7 AS (SELECT ${k}s, n, b,
       |        CASE WHEN n % 8 >= 4 THEN $tail4Step ELSE h6 END AS h7 FROM ${p}6),
       |${p}8 AS (SELECT ${k}s, $tailByteReduce AS h8 FROM ${p}7),
       |${p}9 AS (SELECT ${k}s, CAST(CASE WHEN hav >= 9223372036854775808 THEN hav - $M64 ELSE hav END AS BIGINT) AS xxh
       |        FROM (SELECT ${k}s, ${avalanche("h8")} AS hav FROM ${p}8))""".stripMargin
  }

  /** MinHash permutation constants b_i = floorMod(GOLD + i·STEP, P) with
    * Java-Long wraparound — must match
    * [[graft.expressions.MinHashSig]] exactly.
    */
  def minHashBs(k: Int): Seq[Long] = {
    val P = 2147483647L
    (0 until k).map(i => java.lang.Math.floorMod(0x9E3779B97F4A7C15L + i * 0x632BE59BD9B4E019L, P))
  }

  /** Shared CTE prefix for the MinHash oracles: whitespace tokens → distinct
    * 3-gram shingles (ShingleHashes semantics: empty doc → [''], short doc →
    * one whole-doc shingle) → per-shingle xxh64 → per-doc distinct hash set →
    * 32-perm MinHash signature ((h mod P)·(2j+1) + b_j, all mod P = 2^31-1).
    */
  def minHashSigsCte(docsRel: String): String = {
    val P = 2147483647L
    val bsSql = minHashBs(32).mkString("[", ",", "]")
    s"""tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS t
       |  FROM $docsRel
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(CASE
       |    WHEN len(t) = 0 THEN ['']
       |    WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |    ELSE list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |  END)) AS s0
       |  FROM tok
       |), ${xxh64Cte("sh", "s0", Seq("doc_id"))},
       |hs AS MATERIALIZED (
       |  SELECT doc_id, list_distinct(list(xxh)) AS hashes FROM xh9 GROUP BY doc_id
       |), sigs AS MATERIALIZED (
       |  SELECT doc_id, hashes,
       |    list_transform(range(0, 32), j -> list_min(list_transform(hashes,
       |      h -> (((h % $P + $P) % $P) * (2*j+1) + ($bsSql)[j+1]) % $P))) AS sig
       |  FROM hs
       |)""".stripMargin
  }

  /** Full q23 oracle: LSH band collision (8 bands × 4 rows — two docs
    * collide iff their signatures agree on a whole band, compared as raw
    * slices, which is exactly the band_hash equality modulo xxh collisions)
    * → exact Jaccard over the shingle-hash sets → round4 ≥ threshold.
    */
  def nearDupMinHashOracle(threshold: Double): String =
    s"""WITH ${minHashSigsCte("documents")},
       |bands AS (
       |  SELECT doc_id, b, sig[4*b+1:4*b+4] AS slice FROM sigs, (SELECT unnest(range(0,8)) AS b)
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
       |  FROM bands a JOIN bands c ON a.b = c.b AND a.slice = c.slice AND a.doc_id < c.doc_id
       |), pairs AS (
       |  SELECT id_a, id_b,
       |    CAST(len(list_intersect(ha.hashes, hb.hashes)) AS DOUBLE)
       |      / (len(ha.hashes) + len(hb.hashes) - len(list_intersect(ha.hashes, hb.hashes))) AS j
       |  FROM cand JOIN hs ha ON cand.id_a = ha.doc_id JOIN hs hb ON cand.id_b = hb.doc_id
       |)
       |SELECT id_a, id_b, floor(j * 10000.0 + 0.5) / 10000.0 AS jaccard
       |FROM pairs WHERE floor(j * 10000.0 + 0.5) / 10000.0 >= $threshold""".stripMargin

  /** Full q24 oracle: SimHash near-dup. Per-token xxh64 with multiplicity
    * (bit votes count duplicate tokens), 64-bit majority signature,
    * pigeonhole banding into maxHamming+1 = 4 disjoint 16-bit bands (two
    * docs within radius 3 MUST agree on ≥1 whole band), Hamming verification
    * via `bit_count(xor(...))`. Zero-token docs vote nowhere → sig = 0,
    * matching [[graft.expressions.SimHash64]].
    */
  def nearDupSimHashOracle(maxHamming: Int): String = {
    require(maxHamming == 3, "oracle banding is specialized to 4x16-bit bands (radius 3)")
    val pw = (0 until 64).map(b => s"($b,${BigInt(1) << b}::HUGEINT)").mkString(",")
    val bandPw = (0 until 4).map(q => s"WHEN $q THEN ${BigInt(1) << (16 * q)}").mkString(" ")
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS t
       |  FROM documents
       |), tcount AS (
       |  SELECT doc_id, t0 AS s0, count(*) AS cnt
       |  FROM (SELECT doc_id, unnest(t) AS t0 FROM tok) GROUP BY 1, 2
       |), ${xxh64Cte("tcount", "s0", Seq("doc_id", "cnt"))},
       |hu AS (
       |  SELECT doc_id, cnt,
       |    CASE WHEN xxh < 0 THEN CAST(xxh AS HUGEINT) + $M64 ELSE CAST(xxh AS HUGEINT) END AS h
       |  FROM xh9
       |), bits(b, pw) AS (VALUES $pw),
       |votes AS (
       |  SELECT doc_id, b, pw, sum(CASE WHEN (h // pw) % 2 = 1 THEN cnt ELSE -cnt END) AS v
       |  FROM hu, bits GROUP BY 1, 2, 3
       |), sigs0 AS (
       |  SELECT doc_id, sum(CASE WHEN v > 0 THEN pw ELSE 0::HUGEINT END) AS sigu FROM votes GROUP BY doc_id
       |), sigs AS (
       |  SELECT d.doc_id, coalesce(s.sigu, 0::HUGEINT) AS sigu,
       |    CAST(CASE WHEN coalesce(s.sigu, 0::HUGEINT) >= 9223372036854775808
       |         THEN coalesce(s.sigu, 0::HUGEINT) - $M64
       |         ELSE coalesce(s.sigu, 0::HUGEINT) END AS BIGINT) AS sig
       |  FROM documents d LEFT JOIN sigs0 s ON d.doc_id = s.doc_id
       |), banded AS MATERIALIZED (
       |  SELECT doc_id, sigu, sig, q,
       |    CAST((sigu // (CASE q $bandPw END)::HUGEINT) % 65536 AS BIGINT) AS qh
       |  FROM sigs, (SELECT unnest(range(0,4)) AS q)
       |)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |FROM banded a JOIN banded b ON a.q = b.q AND a.qh = b.qh AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= $maxHamming""".stripMargin
  }

  /** Full q51 oracle: winnowing (MOSS) near-dup. Character-level k=8-gram
    * polynomial hashes over the UTF-8 bytes of `lower(text)` with Java-Long
    * wraparound (restated as mod-2^64 HUGEINT arithmetic; bytes < 256 so
    * byte×constant products never need the 32-bit split), splitmix64
    * finalizer, w=16 window minima (the min VALUE per window — the
    * rightmost-tie position rule in the JVM loop cannot change the selected
    * value set), distinct sketch, df≤maxDf rare-print candidate pairing,
    * exact sketch Jaccard ≥ threshold. The sketch CTE is MATERIALIZED: it is
    * referenced three times and DuckDB would otherwise inline-recompute it
    * (measured 175 s → 41 s at sf0.01).
    */
  def nearDupWinnowingOracle(threshold: Double, maxDf: Int): String = {
    val B = BigInt(1000003)
    val C1 = BigInt("9E3779B97F4A7C15", 16)
    val C2 = BigInt("BF58476D1CE4E5B9", 16)
    val C3 = BigInt("94D049BB133111EB", 16)
    def mix(g: String): String = {
      val z1 = s"((($g) + $C1) % $M64)"
      val z2 = mul(xor(z1, s"($z1) // ${BigInt(1) << 30}"), C2)
      val z3 = mul(xor(z2, s"($z2) // ${BigInt(1) << 27}"), C3)
      xor(z3, s"($z3) // ${BigInt(1) << 31}")
    }
    val bpow = (0 until 8).map(j => B.modPow(BigInt(j), M64))
    val gram = "((" + (0 until 8).map(j => s"b[i+$j] * ${bpow(7 - j)}").mkString(" + ") + s") % $M64)"
    val bpLit = bpow.map(p => s"$p::HUGEINT").mkString("[", ",", "]")
    val shortPoly =
      s"(coalesce(list_sum(list_transform(range(1, n+1), i -> CAST(($bpLit)[n-i+1] AS HUGEINT) * b[i])), 0) % $M64)"
    val least16 = "least(" + (0 until 16).map(j => s"hs[s+$j]").mkString(",") + ")"
    s"""WITH wn1 AS (
       |  SELECT doc_id, upper(hex(encode(lower(text)))) AS hx,
       |    octet_length(encode(lower(text))) AS n
       |  FROM documents
       |), wn2 AS (
       |  SELECT doc_id, n, list_transform(range(1, n+1), i -> CAST(
       |    (strpos($Hex, substring(hx, 2*i-1, 1))-1)*16 + strpos($Hex, substring(hx, 2*i, 1))-1 AS HUGEINT)) AS b
       |  FROM wn1
       |), wn3 AS (
       |  SELECT doc_id,
       |    CASE WHEN n < 8 THEN [${mix(shortPoly)}]
       |    ELSE list_transform(range(1, n-6), i -> ${mix(gram)}) END AS hs
       |  FROM wn2
       |), wn4 AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN len(hs) <= 16 THEN [list_min(hs)]
       |    ELSE list_distinct(list_transform(range(1, len(hs)-14), s -> $least16)) END AS sketch
       |  FROM wn3
       |), prints AS (
       |  SELECT doc_id, unnest(sketch) AS p FROM wn4
       |), rare AS (
       |  SELECT doc_id, p FROM prints WHERE p IN (
       |    SELECT p FROM prints GROUP BY p HAVING count(*) <= $maxDf)
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM rare a JOIN rare b ON a.p = b.p AND a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT id_a, id_b,
       |    CAST(len(list_intersect(sa.sketch, sb.sketch)) AS DOUBLE)
       |      / (len(sa.sketch) + len(sb.sketch) - len(list_intersect(sa.sketch, sb.sketch))) AS j
       |  FROM cand JOIN wn4 sa ON cand.id_a = sa.doc_id JOIN wn4 sb ON cand.id_b = sb.doc_id
       |)
       |SELECT id_a, id_b, floor(j * 10000.0 + 0.5) / 10000.0 AS jaccard
       |FROM pairs WHERE floor(j * 10000.0 + 0.5) / 10000.0 >= $threshold""".stripMargin
  }

  /** Full q50 oracle: incremental MinHash — odd-id docs are the "new" batch,
    * even-id docs the landed corpus; candidates are cross-side band
    * collisions only (matching nearDupMinHashIncremental).
    */
  def nearDupMinHashIncrementalOracle(threshold: Double): String =
    s"""WITH ${minHashSigsCte("documents")},
       |bands AS (
       |  SELECT doc_id, b, sig[4*b+1:4*b+4] AS slice FROM sigs, (SELECT unnest(range(0,8)) AS b)
       |), cand AS (
       |  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS dup_of
       |  FROM bands n JOIN bands c ON n.b = c.b AND n.slice = c.slice
       |  WHERE n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
       |), pairs AS (
       |  SELECT new_id, dup_of,
       |    CAST(len(list_intersect(hn.hashes, hc.hashes)) AS DOUBLE)
       |      / (len(hn.hashes) + len(hc.hashes) - len(list_intersect(hn.hashes, hc.hashes))) AS j
       |  FROM cand JOIN hs hn ON cand.new_id = hn.doc_id JOIN hs hc ON cand.dup_of = hc.doc_id
       |)
       |SELECT new_id, dup_of, floor(j * 10000.0 + 0.5) / 10000.0 AS jaccard
       |FROM pairs WHERE floor(j * 10000.0 + 0.5) / 10000.0 >= $threshold""".stripMargin
}
