package graft.ext

/** DuckDB SQL generators replaying Spark's XXH64 (the `xxhash64`
  * expression family: seed-chained over arguments, seed 42) and the
  * engine's MinHash+LSH banding bit-exactly — the banding-replay oracle
  * the r12 VERDICT asked for (item 4): the MinHash LSH keys used an
  * exact-Jaccard oracle, which rides a deterministic 2.2e-4/pair miss
  * chance for pairs in [0.8, 0.9) that the 16x4 banding can drop. With
  * the banding replayed, the oracle predicts the engine's exact candidate
  * set and the probabilistic pass-chance is gone (the
  * dedup_embedding_cosine pattern, applied to the hash family that
  * needed a full XXH64 replay).
  *
  * Arithmetic style: all 64-bit state is UBIGINT; wrap-around multiplies
  * use the established 32-bit-limb HUGEINT trick (the SplitMix64 chains'
  * pattern); rotations split into a HUGEINT shift mod 2^64 plus the
  * spilled high bits. Every hash step is its OWN CTE stage — DuckDB
  * binds lateral aliases by substitution, so chaining stages inside one
  * SELECT overflows the binder's recursion depth (measured), and textual
  * helper nesting explodes exponentially (a 3-deep hashLong chain
  * measured 2.5 GB of SQL); the staged-CTE form is ~50 KB total.
  *
  * Scope: NONE — r14 retired both halves of the former boundary. Word
  * hashes implement the FULL XXH64: the byte list is derived
  * arithmetically from code points (1-4 UTF-8 bytes per char, validated
  * against encode() through the astral plane), so non-ASCII words
  * replay the engine's hashUnsafeBytes exactly; and words >= 32 bytes
  * run the real 4-lane stripe path (a list_reduce fold with a
  * struct(v1..v4) accumulator — see wordHashCtes). Validated by
  * BandCheck ENGINE-vs-replay bit-equality on the ASCII sf0.01 corpus,
  * a planted non-ASCII corpus, and a planted long-word corpus.
  *
  * Validated end-to-end against pyspark's xxhash64 (word/long/int/chain
  * test vectors), the engine's gram relation, and the full
  * dedup_minhash_lsh output at sf0.01 (25 rows, bit-equal jaccards).
  * Since r14 the lane minima and band keys are additionally validated
  * bit-for-bit against the ENGINE's own output (graft.tools.BandCheck at
  * sf0.01: 32,000/32,000 lane elements, 8,000/8,000 band keys) — the r13
  * form minimized lanes in unsigned order and silently ran an
  * independent banding (see the lanes CTE comment).
  */
private[ext] object XxhashReplaySql {

  private val M64 = "18446744073709551616"
  private val P1 = "11400714785074694791" // 0x9E3779B185EBCA87
  private val P2 = "14029467366897019727" // 0xC2B2AE3D27D4EB4F
  private val P3 = "1609587929392839161"  // 0x165667B19E3779F9
  private val P4 = "9650029242287828579"  // 0x85EBCA77C2B2AE63
  private val P5 = "2870177450012600261"  // 0x27D4EB2F165667C5
  private val GOLDEN = "11400714819323198485" // 0x9E3779B97F4A7C15

  /** DuckDB expression: the UTF-8 byte list (HUGEINT elements) of string
    * expression `s` — code points expanded arithmetically to their 1-4
    * bytes (validated against encode() through the astral plane). Shared
    * by the word-hash CTEs here and the rolling-hash oracle replays
    * (TextOps text_fingerprint_rolling, Dedup dedup_simhash), whose
    * engine kernel hashes UTF8String BYTES — a unicode(c) code-point
    * replay is correct only on ASCII. */
  private[ext] def utf8Bytes(s: String, typ: String): String =
    s"""flatten(list_transform(string_split($s, ''), ch ->
       |  CASE WHEN unicode(ch) < 128 THEN [unicode(ch)::$typ]
       |       WHEN unicode(ch) < 2048 THEN
       |         [(192 + unicode(ch) // 64)::$typ,
       |          (128 + unicode(ch) % 64)::$typ]
       |       WHEN unicode(ch) < 65536 THEN
       |         [(224 + unicode(ch) // 4096)::$typ,
       |          (128 + (unicode(ch) // 64) % 64)::$typ,
       |          (128 + unicode(ch) % 64)::$typ]
       |       ELSE
       |         [(240 + unicode(ch) // 262144)::$typ,
       |          (128 + (unicode(ch) // 4096) % 64)::$typ,
       |          (128 + (unicode(ch) // 64) % 64)::$typ,
       |          (128 + unicode(ch) % 64)::$typ]
       |  END))""".stripMargin

  private[ext] def utf8BytesHugeint(s: String): String = utf8Bytes(s, "HUGEINT")

  /** (a * c) mod 2^64 — a: UBIGINT expr, c: unsigned-64 constant. */
  private def xmul(a: String, c: String): String =
    s"CAST((((($a) % 4294967296)::HUGEINT * $c) + " +
      s"((((($a) >> 32)::HUGEINT * $c) % 4294967296) << 32)) " +
      s"% $M64 AS UBIGINT)"

  private def rotl(a: String, r: Int): String =
    s"CAST(((($a)::HUGEINT << $r) % $M64 + (($a) >> ${64 - r})) AS UBIGINT)"

  private def add64(a: String, b: String): String =
    s"CAST(((($a)::HUGEINT + ($b)) % $M64) AS UBIGINT)"

  private def xor(a: String, b: String): String = s"xor($a, $b)"

  /** CTE-staged hash pipeline: each appended stage is one CTE selecting
    * the carried columns plus one new column from the previous stage. */
  private final class Chain(name: String, baseSql: String,
      private var carried: String) {
    private var n = 0
    private val ctes = scala.collection.mutable.ArrayBuffer(
      s"${name}_0 AS ($baseSql)")

    def stage(expr: String, out: String): this.type = {
      val prev = s"${name}_$n"
      n += 1
      ctes += s"${name}_$n AS (SELECT $carried, $expr AS $out FROM $prev)"
      carried = s"$carried, $out"
      this
    }

    /** XXH64 finalizer (fmix). */
    def fmix(h: String, out: String): this.type =
      stage(xmul(xor(h, s"$h >> 33"), P2), s"${out}_f1")
        .stage(xmul(xor(s"${out}_f1", s"${out}_f1 >> 29"), P3), s"${out}_f2")
        .stage(xor(s"${out}_f2", s"${out}_f2 >> 32"), out)

    /** XXH64.hashLong(v, seed) — one 8-byte block + fmix. */
    def hashLong(v: String, seed: String, out: String): this.type =
      stage(xmul(rotl(xmul(v, P2), 31), P1), s"${out}_k")
        .stage(xor(add64(seed, s"$P5::HUGEINT + 8"), s"${out}_k"),
          s"${out}_h1")
        .stage(add64(xmul(rotl(s"${out}_h1", 27), P1), P4), s"${out}_h2")
        .fmix(s"${out}_h2", out)

    /** XXH64.hashInt(v, seed) — one 4-byte block + fmix (Spark hashes an
      * IntegerType argument through this path). */
    def hashInt(v: String, seed: String, out: String): this.type =
      stage(xor(add64(seed, s"$P5::HUGEINT + 4"),
          xmul(s"($v)::UBIGINT", P1)), s"${out}_h1")
        .stage(add64(xmul(rotl(s"${out}_h1", 23), P2), P3), s"${out}_h2")
        .fmix(s"${out}_h2", out)

    def sql: String = ctes.mkString(",\n")
    def last: String = s"${name}_$n"
  }

  /** Little-endian UBIGINT from `n` bytes of the `bts` byte list starting
    * at 1-based index expr `base`. Multiply by 2^(8j), never `<<`:
    * DuckDB's shift coerces to signed BIGINT, so a byte > 127 shifted by
    * 56 overflows (surfaced by the first non-ASCII corpus — ASCII bytes
    * are <= 127 and masked it); the UBIGINT product maxes at
    * 255 * 2^56 < 2^64, no wraparound. */
  private def le(n: Int, base: String): String =
    (0 until n).map { j =>
      if (j == 0) s"(bts[$base]::UBIGINT)"
      else s"(bts[$base + $j]::UBIGINT * ${1L << (8 * j)}::UBIGINT)"
    }.mkString("(", " + ", ")")

  /** CTEs `wst_* , wh(w, h)`: XXH64(word bytes, seed 42) per DISTINCT
    * word of `documents.text` split on single spaces (empty tokens
    * included — Spark split semantics). FULL algorithm, no length
    * boundary (r14: both halves of the former scope boundary retired):
    *
    *  - >= 32 bytes: the 4-lane stripe path — one list_reduce fold over
    *    the word's 32-byte stripes with a struct(v1..v4) accumulator
    *    (the init element prepended, the round() arithmetic inside the
    *    lambda over SHORT field names, so the textual-explosion hazard
    *    of nested helper chains does not apply), then the rotl-sum +
    *    four merge rounds as ordinary CTE stages;
    *  - tail bytes after the stripes (or the whole word when < 32
    *    bytes — the stripe base (L // 32) * 32 is 0 there, so the same
    *    stages serve both): up to three 8-byte blocks, one conditional
    *    4-byte block, up to three tail bytes, each a conditional stage.
    *
    * Byte list derived arithmetically from code points (1-4 UTF-8
    * bytes per char), so any UTF-8 text replays the engine's
    * hashUnsafeBytes. Validated: BandCheck bit-equality against the
    * ENGINE on the ASCII sf0.01 corpus, a planted non-ASCII corpus,
    * and a planted long-word (>= 32-byte, mixed ASCII/CJK) corpus. */
  private def wordHashCtes: String = {
    def chunk8(h: String, base: String): String = {
      val k = xmul(rotl(xmul(le(8, base), P2), 31), P1)
      add64(xmul(rotl(xor(h, k), 27), P1), P4)
    }
    val s4 = add64(xmul(rotl(xor("h3",
      xmul(le(4, "(L // 8) * 8 + 1"), P1)), 23), P2), P3)
    def s1(h: String, idx: Int): String =
      xmul(rotl(xor(h, xmul(s"bts[L - L % 4 + $idx]::UBIGINT", P5)), 11), P1)
    // BYTE-level extraction (r14): UTF-8 bytes derived arithmetically
    // from code points — ascii(w[i]) reads the code point, the CASE
    // encodes it as its 1-4 UTF-8 bytes (validated against encode() for
    // ASCII/Latin/CJK/astral) — so any UTF-8 word replays the engine's
    // hashUnsafeBytes.
    val c = new Chain("wst",
      """SELECT w, octet_length(encode(w)) AS L,
        |      flatten(list_transform(range(1, length(w) + 1), i ->
        |        CASE WHEN ascii(w[i]) < 128 THEN [ascii(w[i])]
        |             WHEN ascii(w[i]) < 2048 THEN
        |               [192 + ascii(w[i]) // 64, 128 + ascii(w[i]) % 64]
        |             WHEN ascii(w[i]) < 65536 THEN
        |               [224 + ascii(w[i]) // 4096,
        |                128 + (ascii(w[i]) // 64) % 64,
        |                128 + ascii(w[i]) % 64]
        |             ELSE
        |               [240 + ascii(w[i]) // 262144,
        |                128 + (ascii(w[i]) // 4096) % 64,
        |                128 + (ascii(w[i]) // 64) % 64,
        |                128 + ascii(w[i]) % 64]
        |        END)) AS bts
        |      FROM (SELECT DISTINCT w FROM (
        |        SELECT unnest(string_split(text, ' ')) AS w FROM documents))"""
        .stripMargin,
      "w, L, bts")
    // ---- 4-lane stripe path for words >= 32 bytes (r14: the last scope
    // boundary retired). The fold's list elements and its prepended init
    // share the struct(v1..v4 UBIGINT) shape (list_reduce uses the first
    // element as the accumulator seed); each lambda step is one XXH64
    // round per lane: v = rotl31(v + lane*P2) * P1. Accumulator inits
    // are the seed-42 constants (seed+P1+P2, seed+P2, seed, seed-P1 mod
    // 2^64), precomputed.
    def le8k(off: Int): String =
      (0 until 8).map { j =>
        if (j == 0) s"bts[32*k + $off]::UBIGINT"
        else s"(bts[32*k + ${off + j}]::UBIGINT * ${1L << (8 * j)}::UBIGINT)"
      }.mkString("(", " + ", ")")
    def rnd(acc: String, lane: String): String =
      xmul(rotl(add64(acc, xmul(lane, P2)), 31), P1)
    c.stage(
      s"""CASE WHEN L >= 32 THEN list_reduce(list_prepend(
         |  struct_pack(v1 := 6983438078262162944::UBIGINT,
         |    v2 := 14029467366897019769::UBIGINT, v3 := 42::UBIGINT,
         |    v4 := 7046029288634856867::UBIGINT),
         |  list_transform(range(L // 32), k -> struct_pack(
         |    v1 := ${le8k(1)}, v2 := ${le8k(9)},
         |    v3 := ${le8k(17)}, v4 := ${le8k(25)}))),
         |  (a, x) -> struct_pack(
         |    v1 := ${rnd("a.v1", "x.v1")}, v2 := ${rnd("a.v2", "x.v2")},
         |    v3 := ${rnd("a.v3", "x.v3")}, v4 := ${rnd("a.v4", "x.v4")}))
         |END""".stripMargin, "sacc")
    // merged accumulators: h = rotl1(v1)+rotl7(v2)+rotl12(v3)+rotl18(v4),
    // then four merge rounds h = (h ^ round(0, vN)) * P1 + P4
    c.stage(s"CASE WHEN L >= 32 THEN ${
      add64(add64(add64(rotl("sacc.v1", 1), rotl("sacc.v2", 7)),
        rotl("sacc.v3", 12)), rotl("sacc.v4", 18))} END", "hm0")
    def mergeAcc(h: String, v: String): String =
      add64(xmul(xor(h, xmul(rotl(xmul(v, P2), 31), P1)), P1), P4)
    c.stage(s"CASE WHEN L >= 32 THEN ${mergeAcc("hm0", "sacc.v1")} END", "hm1")
    c.stage(s"CASE WHEN L >= 32 THEN ${mergeAcc("hm1", "sacc.v2")} END", "hm2")
    c.stage(s"CASE WHEN L >= 32 THEN ${mergeAcc("hm2", "sacc.v3")} END", "hm3")
    c.stage(s"CASE WHEN L >= 32 THEN ${mergeAcc("hm3", "sacc.v4")} END", "hm4")
    // h0: merged-stripe state + L for long words, seed + P5 + L for
    // short ones. The tail stages below then run over the bytes AFTER
    // the stripes at base (L // 32) * 32 — which is 0 for short words,
    // so one set of stages serves both paths (conditions on L % 32
    // reduce to the old L >= 8/16/24 when L < 32).
    c.stage(s"CASE WHEN L >= 32 THEN ${add64("hm4", "L")} " +
      s"ELSE CAST((42::HUGEINT + $P5 + L) % $M64 AS UBIGINT) END", "h0")
    c.stage(s"CASE WHEN L % 32 >= 8 THEN ${
      chunk8("h0", "(L // 32) * 32 + 1")} ELSE h0 END", "h1")
    c.stage(s"CASE WHEN L % 32 >= 16 THEN ${
      chunk8("h1", "(L // 32) * 32 + 9")} ELSE h1 END", "h2")
    c.stage(s"CASE WHEN L % 32 >= 24 THEN ${
      chunk8("h2", "(L // 32) * 32 + 17")} ELSE h2 END", "h3")
    c.stage(s"CASE WHEN L % 8 >= 4 THEN $s4 ELSE h3 END", "h4")
    c.stage(s"CASE WHEN L % 4 >= 1 THEN ${s1("h4", 1)} ELSE h4 END", "h5")
    c.stage(s"CASE WHEN L % 4 >= 2 THEN ${s1("h5", 2)} ELSE h5 END", "h6")
    c.stage(s"CASE WHEN L % 4 >= 3 THEN ${s1("h6", 3)} ELSE h6 END", "h7")
    c.fmix("h7", "h")
    c.sql + s",\nwh AS (SELECT w, h FROM ${c.last})"
  }

  /** CTEs `grm_* , gram(doc_id, gh)`: the WordGramHashes 3-gram window —
    * xxhash64(wh_i, wh_{i+1}, wh_{i+2}) seed-chained from 42 over
    * per-position word hashes. */
  private def gramCtes: String = {
    val c = new Chain("grm",
      """SELECT a.doc_id, a.i, a.h AS ah_, b.h AS bh_, c.h AS ch_
        |      FROM dwh a JOIN dwh b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |      JOIN dwh c ON c.doc_id = a.doc_id AND c.i = a.i + 2"""
        .stripMargin,
      "doc_id, i, ah_, bh_, ch_")
    c.hashLong("ah_", "42::UBIGINT", "gh1")
    c.hashLong("bh_", "gh1", "gh2")
    c.hashLong("ch_", "gh2", "gh")
    c.sql + s",\ngram AS (SELECT doc_id, gh FROM ${c.last})"
  }

  /** CTEs `mh_* , lanes, sigl, bk_* , bands(doc_id, bh)`: the MinHashAgg
    * lane family m_i = SplitMix64(gh XOR GOLDEN*i) minimized per
    * (doc, lane), then the engine's band keys
    * xxhash64(sig[4b+1..4b+4], b::INT) per 16 bands. */
  private def minhashBandCtes(numHashes: Int, bands: Int,
      rowsPerBand: Int): String = {
    val mix = new Chain("mh",
      s"""SELECT g.doc_id, t.i,
         |        xor(g.gh, CAST(($GOLDEN::HUGEINT * t.i) % $M64 AS UBIGINT)) AS z0
         |      FROM gram g CROSS JOIN range($numHashes) t(i)""".stripMargin,
      "doc_id, i")
    mix.stage(xmul(xor("z0", "z0 >> 30"), "13787848793156543929"), "z1")
    mix.stage(xmul(xor("z1", "z1 >> 27"), "10723151780598845931"), "z2")
    mix.stage(xor("z2", "z2 >> 31"), "m")
    val bc = new Chain("bk",
      s"""SELECT doc_id, t.b,
         |        sig[$rowsPerBand*t.b + 1] AS e1, sig[$rowsPerBand*t.b + 2] AS e2,
         |        sig[$rowsPerBand*t.b + 3] AS e3, sig[$rowsPerBand*t.b + 4] AS e4
         |      FROM sigl CROSS JOIN range($bands) t(b)""".stripMargin,
      "doc_id, b, e1, e2, e3, e4")
    require(rowsPerBand == 4, "band-key CTE is written for 4 rows/band")
    bc.hashLong("e1", "42::UBIGINT", "b1")
    bc.hashLong("e2", "b1", "b2")
    bc.hashLong("e3", "b2", "b3")
    bc.hashLong("e4", "b3", "b4")
    bc.hashInt("b::INT", "b4", "bh")
    // The engine's MinHashAgg.fold minimizes in SIGNED Long order (buffer
    // seeded Long.MaxValue, `m < buf(i)` on Long); a plain MIN(m) over
    // UBIGINT minimizes in unsigned order and picks a DIFFERENT signature
    // element whenever a lane sees both top-bit-set and top-bit-clear
    // mixed values — i.e. virtually every lane. xor with 2^63 is the
    // order isomorphism between unsigned and signed 64-bit (a <s b iff
    // (a^2^63) <u (b^2^63)): flip, MIN in unsigned, flip back — the
    // selected element keeps its original bit pattern for the band-key
    // hashes below. (r13 shipped the plain MIN; the green gate did not
    // catch it because planted pairs sit at j >= 0.9 where any valid
    // banding finds them — the divergence was an independent banding,
    // not a wrong jaccard. BandCheck now validates lanes AND band keys
    // bit-equal against the engine at sf0.01.)
    val sgn = "9223372036854775808::UBIGINT"
    mix.sql +
      s""",
         |lanes AS (SELECT doc_id, i,
         |    xor(MIN(xor(m, $sgn)), $sgn) AS s FROM ${mix.last}
         |  GROUP BY 1, 2),
         |sigl AS (SELECT doc_id, list(s ORDER BY i) AS sig FROM lanes
         |  GROUP BY 1),
         |""".stripMargin + bc.sql +
      s",\nbands AS (SELECT doc_id, bh FROM ${bc.last})"
  }

  /** The shared prefix for both MinHash LSH oracles: word hashes, the
    * per-position word relation, gram hashes, minhash signatures, band
    * keys, and the hashed shingle sets the verification uses (the SAME
    * sets the engine intersects, so the jaccard doubles are identical). */
  def minhashPipelineCtes(numHashes: Int, bands: Int,
      rowsPerBand: Int): String =
    wordHashCtes +
      """,
        |docw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |dwh AS (SELECT d.doc_id, t.i, wh.h
        |  FROM docw d, unnest(range(1, len(d.ws) + 1)) AS t(i)
        |  JOIN wh ON wh.w = d.ws[t.i]),
        |""".stripMargin + gramCtes + ",\n" +
      minhashBandCtes(numHashes, bands, rowsPerBand) +
      """,
        |gsets AS (SELECT DISTINCT doc_id, gh FROM gram),
        |gn AS (SELECT doc_id, COUNT(*) AS cnt FROM gsets GROUP BY 1)"""
        .stripMargin
}
