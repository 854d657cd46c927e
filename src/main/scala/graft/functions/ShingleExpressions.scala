package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.GraftColumnBridge

/** Custom Catalyst expressions for word-shingle generation.
  *
  * The declarative formulation
  * (`transform(sequence(...), i -> concat_ws(element_at...))`) is a
  * higher-order function chain that Catalyst evaluates interpreted,
  * one expression-tree walk per shingle (~60 µs/shingle measured at
  * sf0.1 — the dominant cost of the dedup pipeline). These
  * expressions produce identical results with a tight loop over the
  * array data (~100 ns/shingle), a ~40× end-to-end speedup for the
  * shingle-producing stage.
  *
  * Codegen: these bodies use JVM collections (hash sets, rolling
  * windows), so instead of inlining Java they generate a direct
  * `evalCore(childValue)` call on a referenced instance — one virtual
  * call per row, with codegen'd children and NO CodegenFallback row
  * materialization, so the surrounding whole-stage span stays fused.
  *
  * Semantics (must stay bit-identical to the DuckDB oracle in
  * graft.queries.OpsQueries):
  *  - input: array<string> of non-empty word tokens;
  *  - shingle i = words[i] + " " + words[i+1] + " " + words[i+2];
  *  - word hash = numChars*10007 + firstCodepoint*101 + lastCodepoint
  *    (= TextOps.wordHash / ord(substr(w,1,1)), ord(substr(w,-1,1)));
  *  - shingle hash = ((h1*31 + h2)*31 + h3) mod (2^31-1);
  *  - output is DISTINCT, first-occurrence order; [] under 3 words.
  */
object ShingleExpressions {

  /** Null/empty-safe (SQL callers aren't pre-filtered like
    * TextOps.words output): both hash to 0, matching `ascii('')` = 0
    * semantics.
    */
  private[functions] def wordHash(w: UTF8String): Long = {
    if (w == null) return 0L
    val s = w.toString
    if (s.isEmpty) return 0L
    val first = s.codePointAt(0)
    val last = s.codePointBefore(s.length)
    s.codePointCount(0, s.length).toLong * 10007L + first.toLong * 101L + last.toLong
  }

  /** Whitespace tokenizer: the non-empty runs between single spaces —
    * exactly `filter(split(s, " "), w -> w != "")`, as one byte-scan
    * pass (0x20 never occurs inside a UTF-8 multi-byte sequence, so
    * byte-level splitting is code-point-safe). Exists because the
    * higher-order-function formulation is CodegenFallback: it forced
    * every tokenize-hosting Project in the engine out of its
    * whole-stage span, and it re-walked an interpreted expression
    * tree per row in the hottest path the engine has (TextOps.words
    * feeds ~20 queries).
    */
  case class WhitespaceWords(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      val b = s.getBytes
      val out = new java.util.ArrayList[UTF8String]()
      var start = 0
      var i = 0
      while (i <= b.length) {
        if (i == b.length || b(i) == 0x20) {
          if (i > start) out.add(UTF8String.fromBytes(b, start, i - start))
          start = i + 1
        }
        i += 1
      }
      new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
    }
    def evalCore(v: Any): ArrayData = nullSafeEval(v).asInstanceOf[ArrayData]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("expr", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalCore($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  def whitespaceWords(text: Column): Column =
    GraftColumnBridge.column(WhitespaceWords(GraftColumnBridge.expression(text)))

  /** Distinct word 3-gram shingle strings. */
  case class DistinctWordShingles(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes =
      Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < 3) new GenericArrayData(Array.empty[Any])
      else {
        val sep = UTF8String.fromString(" ")
        val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
        var i = 0
        while (i <= n - 3) {
          seen.add(UTF8String.concatWs(sep,
            arr.getUTF8String(i), arr.getUTF8String(i + 1), arr.getUTF8String(i + 2)))
          i += 1
        }
        new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
      }
    }
    def evalCore(v: Any): ArrayData = nullSafeEval(v).asInstanceOf[ArrayData]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("expr", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalCore($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Distinct word 3-gram shingle hashes (poly combine mod 2^31-1). */
  case class DistinctShingleHashes(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes =
      Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < 3) new GenericArrayData(Array.empty[Any])
      else {
        // rolling window of the three word hashes
        val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
        var h1 = wordHash(arr.getUTF8String(0))
        var h2 = wordHash(arr.getUTF8String(1))
        var i = 2
        while (i < n) {
          val h3 = wordHash(arr.getUTF8String(i))
          seen.add(((h1 * 31L + h2) * 31L + h3) % 2147483647L)
          h1 = h2; h2 = h3
          i += 1
        }
        new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
      }
    }
    def evalCore(v: Any): ArrayData = nullSafeEval(v).asInstanceOf[ArrayData]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("expr", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalCore($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** 32-bit SimHash over a token array in ONE pass: each word hashes
    * once and votes ±1 on all 32 bits; bit b of the result is set iff
    * its vote sum is positive. Replaces 32 separate interpreted
    * `aggregate()` walks (one per bit) with a single tight loop —
    * identical values, same contract as the DuckDB oracle.
    */
  case class SimHash32(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes =
      Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Long](32)
      var i = 0
      while (i < arr.numElements()) {
        val h = wordHash(arr.getUTF8String(i))
        var b = 0
        while (b < 32) {
          votes(b) += ((h >> b) & 1L) * 2L - 1L
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 32) {
        if (votes(b) > 0) out |= 1L << b
        b += 1
      }
      out
    }
    def evalCore(v: Any): Long = nullSafeEval(v).asInstanceOf[Long]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("expr", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalCore($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** MinHash signature over a shingle-hash array in ONE pass: for
    * each element, all `ab` permutations update their running minimum
    * (vs. one interpreted aggregate() walk per permutation). Values
    * are identical to the per-permutation fold: min over
    * (a*h + b) mod p with init p.
    */
  case class MinHashSignature(child: Expression, ab: Seq[(Long, Long)], p: Long)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes =
      Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val as: Array[Long] = ab.map(_._1).toArray
    @transient private lazy val bs: Array[Long] = ab.map(_._2).toArray
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val k = as.length
      val sig = Array.fill(k)(p)
      var i = 0
      while (i < arr.numElements()) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % p
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }
    def evalCore(v: Any): ArrayData = nullSafeEval(v).asInstanceOf[ArrayData]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("expr", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalCore($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Content-defined anchor windows for ExactSubstr-style dedup
    * (graft.ops.SubstrDedup): every k-char window whose md5 hex
    * digest starts with `nibble` yields a struct (pos, dg) — 1-based
    * code-point position, full 32-char lowercase hex digest.
    *
    * Bit-identical to the declarative
    * `transform(sequence(...), i -> struct(i, md5(substr(text,i,k))))`
    * + nibble filter, but as one tight loop: one MessageDigest
    * instance per row instead of per window, no per-window struct for
    * the 15/16 of windows the nibble rejects, and no interpreted
    * higher-order expression walk per element (the same overhead that
    * motivated DistinctWordShingles). The anchor decision reads the
    * digest's top 4 bits — the hex string is only materialized for
    * survivors.
    */
  case class ContentAnchors(child: Expression, k: Int, nibble: Char)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(k > 0, "window length must be positive")
    private val nibbleVal: Int = Integer.parseInt(nibble.toString, 16)
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("pos", IntegerType, nullable = false),
        StructField("dg", StringType, nullable = false))),
      containsNull = false)
    private val hexChars = "0123456789abcdef".toCharArray
    override def nullSafeEval(input: Any): Any = {
      val str = input.asInstanceOf[UTF8String].toString
      // code-point start offsets (substr counts code points, not chars)
      val n = str.codePointCount(0, str.length)
      if (n < k) return new GenericArrayData(Array.empty[Any])
      val starts = new Array[Int](n + 1)
      var ci = 0
      var cp = 0
      while (cp < n) { starts(cp) = ci; ci = str.offsetByCodePoints(ci, 1); cp += 1 }
      starts(n) = str.length
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new java.util.ArrayList[Any]()
      var p = 0
      while (p <= n - k) {
        md.reset()
        val win = str.substring(starts(p), starts(p + k))
        val d = md.digest(win.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (((d(0) >> 4) & 0xF) == nibbleVal) {
          val hex = new Array[Char](32)
          var i = 0
          while (i < 16) {
            hex(2 * i) = hexChars((d(i) >> 4) & 0xF)
            hex(2 * i + 1) = hexChars(d(i) & 0xF)
            i += 1
          }
          out.add(org.apache.spark.sql.catalyst.InternalRow(
            p + 1, UTF8String.fromString(new String(hex))))
        }
        p += 1
      }
      new GenericArrayData(out.toArray)
    }
    def evalCore(v: Any): ArrayData = nullSafeEval(v).asInstanceOf[ArrayData]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("expr", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalCore($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def contentAnchors(text: Column, k: Int, nibble: Char): Column =
    GraftColumnBridge.column(
      ContentAnchors(GraftColumnBridge.expression(text), k, nibble))

  def minHashSignature(hashes: Column, ab: Seq[(Long, Long)], p: Long): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(hashes), ab, p))

  def distinctWordShingles(words: Column): Column =
    GraftColumnBridge.column(DistinctWordShingles(GraftColumnBridge.expression(words)))

  def distinctShingleHashes(words: Column): Column =
    GraftColumnBridge.column(DistinctShingleHashes(GraftColumnBridge.expression(words)))

  def simHash32(words: Column): Column =
    GraftColumnBridge.column(SimHash32(GraftColumnBridge.expression(words)))

  /** Per-language trigram occurrence scores in one pass: for each
    * profile, counts leftmost non-overlapping occurrences of each of
    * its trigrams (exactly the `replace`-based length-difference
    * semantics of the SQL oracle), replacing one regexp_replace
    * full-text scan per (language, trigram) pair.
    */
  case class TrigramProfileScores(child: Expression, profiles: Seq[Seq[String]])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val out = new Array[Long](profiles.size)
      var li = 0
      while (li < profiles.size) {
        var total = 0L
        for (t <- profiles(li)) {
          var from = 0
          var idx = text.indexOf(t, from)
          while (idx >= 0) {
            total += 1
            from = idx + t.length
            idx = text.indexOf(t, from)
          }
        }
        out(li) = total
        li += 1
      }
      new GenericArrayData(out)
    }
    def evalCore(v: Any): ArrayData = nullSafeEval(v).asInstanceOf[ArrayData]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("expr", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalCore($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def trigramProfileScores(text: Column, profiles: Seq[Seq[String]]): Column =
    GraftColumnBridge.column(
      TrigramProfileScores(GraftColumnBridge.expression(text), profiles))

  /** Per-language stopword hit counts in one pass over the token
    * array: word w adds 1 to every profile containing w. Replaces one
    * interpreted `filter(ws, isin(...))` array walk per language —
    * and, embedded in an argmax CASE chain, per *reference* — with a
    * single walk and a hash lookup per token.
    */
  case class StopwordProfileScores(child: Expression, profiles: Seq[Seq[String]])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    // word -> indices of profiles listing it (a stopword may belong
    // to several languages, e.g. "la" in es and fr)
    @transient private lazy val memberOf: java.util.HashMap[UTF8String, Array[Int]] = {
      val m = new java.util.HashMap[UTF8String, Array[Int]]()
      for ((p, i) <- profiles.zipWithIndex; w <- p) {
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(i) else prev :+ i)
      }
      m
    }
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val out = new Array[Long](profiles.size)
      var i = 0
      while (i < arr.numElements()) {
        val hit = memberOf.get(arr.getUTF8String(i))
        if (hit != null) {
          var j = 0
          while (j < hit.length) { out(hit(j)) += 1L; j += 1 }
        }
        i += 1
      }
      new GenericArrayData(out)
    }
    def evalCore(v: Any): ArrayData = nullSafeEval(v).asInstanceOf[ArrayData]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("expr", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalCore($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def stopwordProfileScores(words: Column, profiles: Seq[Seq[String]]): Column =
    GraftColumnBridge.column(
      StopwordProfileScores(GraftColumnBridge.expression(words), profiles))
}
