package graft.queries

/** DuckDB-SQL reimplementation of Spark's xxhash64 — the generator
  * behind the r12 promotion of the MinHash/SimHash dedup family from
  * rows-only to hash-exact oracles.
  *
  * Spark's `xxhash64` is reference XXH64 (seed 42) folded left across
  * children; every graft near-dup signature derives from three
  * primitives — `hashLong`, `hashInt`, and the UTF8-bytes string hash
  * — all 64-bit wrapping arithmetic. DuckDB has no xxhash64, but it
  * has exact unsigned 64-bit integers, so the oracle RECOMPUTES the
  * hashes: each primitive unrolls into a chain of flat CTE steps
  * (deeply nested subqueries exhaust DuckDB's parser; flat `WITH`
  * chains do not), with all arithmetic in pure UBIGINT — wrapping
  * add via branch-free 63-bit limbs (CASE branches evaluate eagerly
  * in DuckDB, so an under/overflowing unselected branch still
  * errors), wrapping multiply via 32-bit limb products, rotations as
  * disjoint shift sums. Validated bit-for-bit against Spark's own
  * xxhash64 on string/long/int vectors and on the full corpus.
  *
  * String hashing is FULLY GENERAL: UTF8 bytes are derived from
  * codepoints in SQL (1–4 byte encodings, astral plane included) and
  * the ≥ 32-byte 4-accumulator stripe path folds via `list_reduce`,
  * so any token the corpus can contain hashes identically to Spark
  * (validated on empty/31/32/33/64/255-byte and multi-byte-UTF8
  * vectors).
  *
  * Scale note: the oracle's cost center is the 128-permutation table
  * over DISTINCT shingle hashes (the `perm` CTE) — the j-only half of
  * hashInt is hoisted into a 128-row table and the per-row pipeline
  * carries only (gh, j), so the sf0.01 gate pays ~3 s per dedup
  * oracle.
  */
object XxhashOracle {

  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")
  private val M64 = BigInt(2).pow(64)
  private val B32 = "4294967296"
  private val H63 = "9223372036854775808"

  private def u(n: BigInt): String = s"CAST($n AS UBIGINT)"
  private def mod64(n: BigInt): BigInt = ((n % M64) + M64) % M64

  /** branch-free pure-UBIGINT wrapping add via 63-bit limbs */
  private def wadd(a: String, b: String): String = {
    val (x, y) = (s"($a)", s"($b)")
    val lo = s"($x % $H63 + $y % $H63)"
    s"($lo % $H63 + (($x // $H63 + $y // $H63 + $lo // $H63) % 2) * $H63)"
  }

  /** 64-bit wrapping multiply via 32-bit limb products (all
    * intermediates < 2^64)
    */
  private def wmul(a: String, b: String): String = {
    val lo = s"($a % $B32) * ($b % $B32)"
    val cross = s"(((($a % $B32) * ($b // $B32)) % $B32 + " +
      s"((($a // $B32) * ($b % $B32)) % $B32)) % $B32) * $B32"
    wadd(lo, cross)
  }

  private def rotl(x: String, r: Int): String = {
    val loMod = BigInt(2).pow(64 - r)
    s"(($x % $loMod) * ${BigInt(2).pow(r)} + ($x // $loMod))"
  }

  private def bxor(a: String, b: String): String = s"xor($a, $b)"
  private def shr(x: String, n: Int): String = s"($x // ${BigInt(2).pow(n)})"

  private def toU64(v: String): String =
    s"CAST((CAST($v AS HUGEINT) + $M64) % $M64 AS UBIGINT)"
  private def toI64(uc: String): String =
    s"CAST(CASE WHEN $uc >= $H63 THEN CAST($uc AS HUGEINT) - $M64 " +
      s"ELSE CAST($uc AS HUGEINT) END AS BIGINT)"

  /** Flat chained-CTE builder: `step` binds an expression as a column
    * of the next CTE (optionally pruning the carry to `keep`).
    */
  private final class Pipe(baseSql: String) {
    private val pfx = s"x${Pipe.uid.incrementAndGet()}_"
    private val ctes = scala.collection.mutable.ArrayBuffer(
      s"${pfx}0 AS (SELECT * FROM ($baseSql))")
    private var n = 0
    private var fin: Option[String] = None
    def step(expr: String, keep: Seq[String] = Nil): String = {
      val name = s"_s$n"; n += 1
      val prev = s"$pfx${ctes.size - 1}"
      val cols = if (keep.nonEmpty) keep.mkString("", ", ", ", ") else "*, "
      ctes += s"$pfx${ctes.size} AS (SELECT $cols$expr AS $name FROM $prev)"
      name
    }
    def done(cols: String*): String = { fin = Some(cols.mkString(", ")); sql }
    def sql: String = {
      val last = fin.map(c => s"SELECT $c FROM $pfx${ctes.size - 1}")
        .getOrElse(s"SELECT * FROM $pfx${ctes.size - 1}")
      ctes.mkString("WITH ", ",\n", "\n") + last
    }
  }
  // atomic: oracle SQL may be generated from parallel test suites;
  // colliding CTE prefixes would interleave non-deterministically
  private object Pipe { val uid = new java.util.concurrent.atomic.AtomicInteger(0) }

  private def fmix(p: Pipe, h0: String): String = {
    val f1 = p.step(bxor(h0, shr(h0, 33)))
    val f2 = p.step(wmul(f1, u(P2)))
    val f3 = p.step(bxor(f2, shr(f2, 29)))
    val f4 = p.step(wmul(f3, u(P3)))
    p.step(bxor(f4, shr(f4, 32)))
  }

  /** XXH64.hashLong over a UBIGINT column, seed a UBIGINT expr. */
  private def hashLong(p: Pipe, v: String, seed: String): String = {
    val a = p.step(wmul(v, u(P2)))
    val b = p.step(rotl(a, 31))
    val k3 = p.step(wmul(b, u(P1)))
    val h0 = p.step(wadd(seed, u(P5 + 8)))
    val h1 = p.step(bxor(h0, k3))
    val h2 = p.step(rotl(h1, 27))
    val h3 = p.step(wmul(h2, u(P1)))
    val h4 = p.step(wadd(h3, u(P4)))
    fmix(p, h4)
  }

  /** XXH64.hashInt over an expr in [0, 2^32), seed a UBIGINT expr. */
  private def hashInt(p: Pipe, v32: String, seed: String): String = {
    val k = p.step(wmul(s"CAST($v32 AS UBIGINT)", u(P1)))
    val h0 = p.step(wadd(seed, u(P5 + 4)))
    val h1 = p.step(bxor(h0, k))
    val h2 = p.step(rotl(h1, 23))
    val h3 = p.step(wmul(h2, u(P2)))
    val h4 = p.step(wadd(h3, u(P3)))
    fmix(p, h4)
  }

  /** XXH64(UTF8(w), 42) for ANY string: UTF8 bytes derived from
    * codepoints (1–4 byte encodings, astral plane included), the
    * ≥ 32-byte 4-accumulator stripes as a `list_reduce` fold, then up
    * to three guarded remaining words, the optional 4-byte round, up
    * to three tail bytes, and the avalanche. Validated bit-for-bit
    * against Spark on empty/short/31/32/33/64/255-byte and
    * 2/3/4-byte-UTF8 vectors. `w` is a string column name.
    */
  private def hashString(p: Pipe, w: String): String = {
    val bl = p.step(
      s"flatten([CASE WHEN cp < 128 THEN [cp] " +
        s"WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64] " +
        s"WHEN cp < 65536 THEN [224 + cp // 4096, 128 + (cp // 64) % 64, 128 + cp % 64] " +
        s"ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64, 128 + (cp // 64) % 64, " +
        s"128 + cp % 64] END " +
        s"FOR cp IN [ord(substr($w, CAST(i AS INT), 1)) FOR i IN range(1, len($w) + 1)]])")
    val n = p.step(s"CAST(len($bl) AS UBIGINT)")
    def byteAt(pos: String): String = s"coalesce($bl[CAST(($pos) AS INT) + 1], 0)"
    def leWord(off: String, bytes: Int): String =
      (0 until bytes).map(t =>
        s"CAST(${byteAt(s"$off + $t")} AS UBIGINT) * ${BigInt(2).pow(8 * t)}")
        .mkString("(", " + ", ")")
    // ---- >= 32 bytes: 4 accumulators folded over 32-byte stripes.
    // HUGEINT variants INSIDE the lambda (no let-bindings there, so
    // the pure-UBIGINT forms' textual duplication explodes; HUGEINT
    // is slower per row but stripe rows exist only for long tokens).
    def wmH(a: String, b: String): String =
      s"CAST((CAST(($a) % $B32 AS HUGEINT) * (($b) % $B32) + " +
        s"((CAST(($a) % $B32 AS HUGEINT) * (($b) // $B32) + " +
        s"CAST(($a) // $B32 AS HUGEINT) * (($b) % $B32)) % $B32) * $B32) " +
        s"% $M64 AS UBIGINT)"
    def waH(a: String, b: String): String =
      s"CAST((CAST($a AS HUGEINT) + ($b)) % $M64 AS UBIGINT)"
    def rnd(acc: String, k: String): String =
      wmH(rotl(waH(acc, wmH(k, u(P2))), 31), u(P1))
    val init = Seq(mod64(BigInt(42) + P1 + P2), mod64(BigInt(42) + P2),
      BigInt(42), mod64(BigInt(42) - P1))
      .map(v => s"CAST($v AS UBIGINT)").mkString("[", ", ", "]")
    val stripe = (0 until 4).map(o => leWord(s"32 * s + ${8 * o}", 8))
      .mkString("[", ", ", "]")
    val stripes = p.step(s"[$stripe FOR s IN range(0, CAST($n // 32 AS BIGINT))]")
    val lam = (1 to 4).map(i => rnd(s"acc[$i]", s"st[$i]")).mkString("[", ", ", "]")
    val accs = p.step(s"list_reduce(list_prepend($init, $stripes), (acc, st) -> $lam)")
    val v = (1 to 4).map(i => p.step(s"$accs[$i]"))
    var hb = p.step(wadd(wadd(rotl(v(0), 1), rotl(v(1), 7)),
      wadd(rotl(v(2), 12), rotl(v(3), 18))))
    for (vi <- v) {
      val vm1 = p.step(wmul(vi, u(P2)))
      val vm2 = p.step(wmul(rotl(vm1, 31), u(P1)))
      val hx = p.step(bxor(hb, vm2))
      hb = p.step(wadd(wmul(hx, u(P1)), u(P4)))
    }
    var h = p.step(s"CASE WHEN $n >= 32 THEN $hb ELSE ${u(mod64(BigInt(42) + P5))} END")
    h = p.step(wadd(h, n))
    val base = s"(($n // 32) * 32)"
    for (off <- Seq(0, 8, 16)) {
      val k0 = p.step(leWord(s"$base + $off", 8))
      val k1 = p.step(wmul(k0, u(P2)))
      val k2 = p.step(rotl(k1, 31))
      val k3 = p.step(wmul(k2, u(P1)))
      val hx = p.step(bxor(h, k3))
      val hr = p.step(rotl(hx, 27))
      val hm = p.step(wmul(hr, u(P1)))
      val ha = p.step(wadd(hm, u(P4)))
      h = p.step(s"CASE WHEN $n - $base >= ${off + 8} THEN $ha ELSE $h END")
    }
    val woff = s"(($n // 8) * 8)"
    val i0 = p.step(leWord(woff, 4))
    val i1 = p.step(wmul(i0, u(P1)))
    val ix = p.step(bxor(h, i1))
    val ir = p.step(rotl(ix, 23))
    val im = p.step(wmul(ir, u(P2)))
    val ia = p.step(wadd(im, u(P3)))
    h = p.step(s"CASE WHEN $n - $woff >= 4 THEN $ia ELSE $h END")
    val boff = s"($woff + CASE WHEN $n - $woff >= 4 THEN 4 ELSE 0 END)"
    for (t <- 0 until 3) {
      val b0 = p.step(s"CAST(${byteAt(s"$boff + $t")} AS UBIGINT)")
      val b1 = p.step(wmul(b0, u(P5)))
      val hx = p.step(bxor(h, b1))
      val hr = p.step(rotl(hx, 11))
      val hm = p.step(wmul(hr, u(P1)))
      h = p.step(s"CASE WHEN $n - ($boff) > $t THEN $hm ELSE $h END")
    }
    fmix(p, h)
  }

  // ---- shared CTE fragments (the Dedup.signatures pipeline) ----

  /** distinct-token XXH64 table: (w, th UBIGINT) */
  private def tokenHashCte(pf: String): String = {
    val p = new Pipe(s"SELECT DISTINCT w FROM ${pf}tokpos")
    val th = hashString(p, "w")
    p.done("w", s"$th AS th")
  }

  /** positional k=3 gram hashes with the padShort short-doc contract:
    * gh = hashLong-fold over up to three token hashes from seed 42.
    */
  private def gramCte(pf: String): String = {
    val p = new Pipe(
      s"""SELECT a.id, t.g,
        |  a.ths[CAST(t.g AS INT) + 1] AS e1,
        |  CASE WHEN t.g + 2 <= a.nt THEN a.ths[CAST(t.g AS INT) + 2] END AS e2,
        |  CASE WHEN t.g + 3 <= a.nt THEN a.ths[CAST(t.g AS INT) + 3] END AS e3,
        |  a.nt
        |FROM ${pf}tokarr a, unnest(range(0, greatest(a.nt - 2, 1))) AS t(g)""".stripMargin)
    val c1 = hashLong(p, "e1", u(BigInt(42)))
    val e2u = p.step("coalesce(e2, CAST(0 AS UBIGINT))")
    val c2x = hashLong(p, e2u, c1)
    val c2 = p.step(s"CASE WHEN g + 2 <= nt THEN $c2x ELSE $c1 END")
    val e3u = p.step("coalesce(e3, CAST(0 AS UBIGINT))")
    val c3x = hashLong(p, e3u, c2)
    val c3 = p.step(s"CASE WHEN g + 3 <= nt THEN $c3x ELSE $c2 END")
    p.done("id", s"$c3 AS gh")
  }

  /** the j-only half of hashInt: k_j = wrapmult(j, P1), 128 rows */
  private def kjCte(numHashes: Int): String = {
    val p = new Pipe(s"SELECT t.j FROM unnest(range(0, $numHashes)) AS t(j)")
    val k = p.step(wmul("CAST(j AS UBIGINT)", u(P1)))
    p.done("j", s"$k AS kj")
  }

  /** per distinct shingle hash: base = hashLong(gh, 42) and hashInt's
    * base-dependent seed term h0 = base + P5 + 4
    */
  private def dbhCte(pf: String): String = {
    val p = new Pipe(s"SELECT gh FROM ${pf}db")
    val base = hashLong(p, "gh", u(BigInt(42)))
    val h0 = p.step(wadd(base, u(P5 + 4)))
    p.done("gh", s"$h0 AS h0")
  }

  /** the permutation table: hashInt(j, base) finished per (gh, j),
    * carrying only those two columns through the narrow pipeline —
    * this is the row-count hot spot (|distinct gh| × numHashes).
    */
  private def permCte(pf: String): String = {
    val keep = Seq("gh", "j")
    val p = new Pipe(s"SELECT d.gh, k.j, k.kj, d.h0 FROM ${pf}dbh d, kj k")
    val h1 = p.step(bxor("h0", "kj"), keep)
    val h2 = p.step(rotl(h1, 23), keep)
    val h3 = p.step(wmul(h2, u(P2)), keep)
    val h4 = p.step(wadd(h3, u(P3)), keep)
    val f1 = p.step(bxor(h4, shr(h4, 33)), keep)
    val f2 = p.step(wmul(f1, u(P2)), keep)
    val f3 = p.step(bxor(f2, shr(f2, 29)), keep)
    val f4 = p.step(wmul(f3, u(P3)), keep)
    val out = p.step(bxor(f4, shr(f4, 32)), keep)
    p.done("gh", "j", s"${toI64(out)} AS pj")
  }

  /** per-(doc, band) LSH bucket hash: fold acc=0 through
    * acc = hashLong(sig_r, hashLong(acc, 42)) over the band's rows
    */
  private def bandCte(pf: String, bands: Int, rpb: Int): String = {
    val slots = (0 until rpb)
      .map(r => s"s.sig[CAST(t.b AS INT) * $rpb + ${r + 1}] AS e$r").mkString(", ")
    val p = new Pipe(
      s"SELECT s.id, t.b, $slots FROM ${pf}sigarr s, unnest(range(0, $bands)) AS t(b)")
    var acc = p.step("CAST(0 AS UBIGINT)")
    for (r <- 0 until rpb) {
      val a1 = hashLong(p, acc, u(BigInt(42)))
      val eu = p.step(toU64(s"e$r"))
      acc = hashLong(p, eu, a1)
    }
    p.done("id", "b", s"$acc AS bh")
  }

  /** docs → token positions → distinct-token hashes (shared head).
    * `pf` prefixes every CTE name so two corpora (e.g. index + new
    * crawl) can ride one statement; `docsSql` yields (id, text).
    */
  private def commonCtes(pf: String, docsSql: String): String =
    s"""${pf}docs AS MATERIALIZED (
       |  SELECT id,
       |    regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS toks
       |  FROM ($docsSql)),
       |${pf}tokpos AS MATERIALIZED (
       |  SELECT d.id, t.i, d.toks[CAST(t.i AS INT) + 1] AS w, len(d.toks) AS nt
       |  FROM ${pf}docs d, unnest(range(0, len(d.toks))) AS t(i)),
       |${pf}dt AS MATERIALIZED (${tokenHashCte(pf)})""".stripMargin

  /** token arrays → grams → signatures → band hashes (shared trunk).
    * The 128-row `kj` table is corpus-independent and emitted once by
    * the caller (not per prefix).
    */
  private def sigCtes(pf: String, numHashes: Int, bands: Int): String = {
    val rpb = numHashes / bands
    s"""${pf}tokarr AS MATERIALIZED (
       |  SELECT p.id, list(dt.th ORDER BY p.i) AS ths, any_value(p.nt) AS nt
       |  FROM ${pf}tokpos p JOIN ${pf}dt dt ON p.w = dt.w GROUP BY p.id),
       |${pf}grams AS MATERIALIZED (${gramCte(pf)}),
       |${pf}dg AS MATERIALIZED (SELECT DISTINCT id, gh FROM ${pf}grams),
       |${pf}db AS MATERIALIZED (SELECT DISTINCT gh FROM ${pf}dg),
       |${pf}dbh AS MATERIALIZED (${dbhCte(pf)}),
       |${pf}perm AS MATERIALIZED (${permCte(pf)}),
       |${pf}sigs AS MATERIALIZED (
       |  SELECT dg.id, p.j, min(p.pj) AS sj
       |  FROM ${pf}dg dg JOIN ${pf}perm p ON dg.gh = p.gh GROUP BY dg.id, p.j),
       |${pf}sigarr AS MATERIALIZED (
       |  SELECT id, list(sj ORDER BY j) AS sig FROM ${pf}sigs GROUP BY id),
       |${pf}bandh AS MATERIALIZED (${bandCte(pf, bands, rpb)})""".stripMargin
  }

  private val allDocsSql = "SELECT doc_id AS id, text FROM documents"

  /** q_dedup_minhash: Dedup.minhashClusters recomputed — cluster =
    * min id over the doc's small (≤ maxBucket) band buckets.
    */
  def minhashClusters(numHashes: Int = 128, bands: Int = 16,
                      maxBucket: Int = 100000): String =
    s"""WITH ${commonCtes("", allDocsSql)},
       |kj AS MATERIALIZED (${kjCte(numHashes)}),
       |${sigCtes("", numHashes, bands)},
       |buckets AS MATERIALIZED (
       |  SELECT b, bh, count(*) AS c, min(id) AS m FROM bandh GROUP BY b, bh)
       |SELECT x.id,
       |  coalesce(min(CASE WHEN k.c <= $maxBucket THEN k.m END), x.id) AS cluster,
       |  x.id = coalesce(min(CASE WHEN k.c <= $maxBucket THEN k.m END), x.id) AS keep
       |FROM bandh x JOIN buckets k ON x.b = k.b AND x.bh = k.bh
       |GROUP BY x.id ORDER BY x.id""".stripMargin

  /** q_dedup_transitive: min-label propagation over the doc–bucket
    * graph, `maxIters` rounds unrolled (extra rounds past the
    * fixpoint are no-ops, so unrolling the max is exact).
    */
  def transitiveClusters(maxIters: Int = 3, numHashes: Int = 128,
                         bands: Int = 16): String = {
    val p = new Pipe("SELECT id, CAST(b AS INT) AS band, bh FROM bandh")
    val h1 = hashInt(p, "band", u(BigInt(42)))
    val h2 = hashLong(p, "bh", h1)
    val edges = p.done("id", s"$h2 AS bucket")
    val rounds = (1 to maxIters).map { i =>
      s"""bm$i AS MATERIALIZED (
         |  SELECT e.bucket, min(c.cluster) AS bmin
         |  FROM edges e JOIN c${i - 1} c ON e.id = c.id GROUP BY e.bucket),
         |c$i AS MATERIALIZED (
         |  SELECT e.id, min(b.bmin) AS cluster
         |  FROM edges e JOIN bm$i b ON e.bucket = b.bucket GROUP BY e.id)""".stripMargin
    }
    s"""WITH ${commonCtes("", allDocsSql)},
       |kj AS MATERIALIZED (${kjCte(numHashes)}),
       |${sigCtes("", numHashes, bands)},
       |edges AS MATERIALIZED ($edges),
       |c0 AS MATERIALIZED (SELECT DISTINCT id, id AS cluster FROM edges),
       |${rounds.mkString(",\n")}
       |SELECT id, cluster, id = cluster AS keep FROM c$maxIters ORDER BY id""".stripMargin
  }

  /** q_dedup_simhash: per-doc 64 bit votes over token-occurrence
    * hashes (bit set iff 2·ones > n), cluster = min id per signature.
    */
  def simhashClusters(): String = {
    val ones = (0 until 64).map(b =>
      s"sum(CASE WHEN (dt.th // ${BigInt(2).pow(b)}) % 2 = 1 THEN 1 ELSE 0 END) AS o$b")
      .mkString(", ")
    val packed = (0 until 64).map(b =>
      s"(CASE WHEN 2 * o$b > n THEN CAST(${BigInt(2).pow(b)} AS UBIGINT) " +
        "ELSE CAST(0 AS UBIGINT) END)").mkString(" + ")
    s"""WITH ${commonCtes("", allDocsSql)},
       |votes AS MATERIALIZED (
       |  SELECT p.id, count(*) AS n, $ones
       |  FROM tokpos p JOIN dt ON p.w = dt.w GROUP BY p.id),
       |sh AS MATERIALIZED (
       |  SELECT id, ${toI64(s"(($packed))")} AS simhash FROM votes),
       |cl AS MATERIALIZED (
       |  SELECT id, simhash, min(id) OVER (PARTITION BY simhash) AS cluster FROM sh)
       |SELECT id, cluster, id = cluster AS keep FROM cl ORDER BY id""".stripMargin
  }

  /** q_dedup_incremental: Dedup.minhashNewVsIndex recomputed — the
    * persisted index's sigs/bands are deterministic functions of the
    * index slice, so the oracle rebuilds BOTH sides' signatures from
    * `documents` directly (two prefixed pipelines in one statement):
    * candidates are (band, bh) collisions against index buckets of
    * ≤ maxBucket members (the stored census the artifact carries),
    * est_jaccard = agreeing signature positions / numHashes, rounded
    * then thresholded exactly as the operator does. The artifact
    * save/load/extend IO path stays pinned by DedupSpec.
    */
  def newVsIndex(numHashes: Int = 128, bands: Int = 64,
                 maxBucket: Int = 1000, minEstJaccard: Double = 0.5): String = {
    val ixDocs = "SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 != 0"
    val nwDocs =
      """SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 = 0
        |UNION ALL
        |SELECT doc_id + 1000000 AS id, text FROM documents WHERE doc_id % 9 = 1""".stripMargin
    // a 128-term "+" chain exceeds DuckDB's binder recursion depth;
    // the zipped list comprehension is flat
    val agree =
      "list_sum([CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END FOR p IN list_zip(n.sig, x.sig)])"
    s"""WITH ${commonCtes("ix_", ixDocs)},
       |kj AS MATERIALIZED (${kjCte(numHashes)}),
       |${sigCtes("ix_", numHashes, bands)},
       |${commonCtes("nw_", nwDocs)},
       |${sigCtes("nw_", numHashes, bands)},
       |ixsmall AS MATERIALIZED (
       |  SELECT b, bh, id FROM ix_bandh
       |  QUALIFY count(*) OVER (PARTITION BY b, bh) <= $maxBucket),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT nb.id, ib.id AS index_id
       |  FROM nw_bandh nb JOIN ixsmall ib ON nb.b = ib.b AND nb.bh = ib.bh)
       |SELECT c.id, c.index_id,
       |  round(($agree) / $numHashes.0, 6) AS est_jaccard
       |FROM cand c
       |JOIN nw_sigarr n ON c.id = n.id
       |JOIN ix_sigarr x ON c.index_id = x.id
       |WHERE round(($agree) / $numHashes.0, 6) >= $minEstJaccard
       |ORDER BY c.id, c.index_id""".stripMargin
  }
}
