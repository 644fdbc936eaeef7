package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The native Catalyst cosine expression must agree bit-for-bit with
  * the composable HOF fold (both are index-ordered double math), in
  * both codegen and interpreted paths. */
class ExpressionSpec extends SparkSpec {

  test("native cosine_sim == HOF fold cosine, bit for bit") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    val pairs = a.join(b, col("b_id") === col("a_id") + 1)
    val diff = pairs.select(
        GraftFunctions.cosineSim(spark, col("ea"), col("eb")).as("native"),
        VectorFunctions.cosine(col("ea"), col("eb")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0, "native and HOF cosine disagree")
  }

  test("native dot_product == HOF fold, bit for bit, codegen and " +
       "interpreted, and relates to cosine_sim by the norm identity") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    val pairs = a.join(b, col("b_id") === col("a_id") + 1)
    // the HOF reference: per-element double widening, index order —
    // the exact semantics the native expression must reproduce
    val hof = expr("""aggregate(
      zip_with(ea, eb, (x, y) -> cast(x as double) * cast(y as double)),
      cast(0.0 as double), (acc, v) -> acc + v)""")
    val diff = pairs.select(
        GraftFunctions.dotProduct(spark, col("ea"), col("eb")).as("native"),
        hof.as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0, "native and HOF dot product disagree")
    // interpreted path (Literal eval, no codegen): same bits as the
    // codegen'd DataFrame path on one concrete pair
    locally {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, FloatType}
      import spark.implicits._
      val va = Array.tabulate(32)(i => math.sin(i + 1).toFloat)
      val vb = Array.tabulate(32)(i => math.cos(i + 1).toFloat)
      val fromDf = Seq((va, vb)).toDF("x", "y")
        .select(GraftFunctions.dotProduct(spark, col("x"), col("y")))
        .head().getDouble(0)
      val interp = graft.functions.expressions.DotProduct(
        Literal.create(va, ArrayType(FloatType)),
        Literal.create(vb, ArrayType(FloatType)))
        .eval(null).asInstanceOf[Double]
      assert(java.lang.Double.doubleToRawLongBits(fromDf) ==
        java.lang.Double.doubleToRawLongBits(interp),
        s"codegen $fromDf != interpreted $interp")
    }
    // cross-check against cosine: dot ≈ cos·‖a‖·‖b‖ (not bit-exact —
    // different op order — but must agree to float tolerance)
    val rel = pairs.select(
        (GraftFunctions.dotProduct(spark, col("ea"), col("eb")) -
          GraftFunctions.cosineSim(spark, col("ea"), col("eb")) *
            sqrt(expr("aggregate(ea, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double))")) *
            sqrt(expr("aggregate(eb, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double))")))
          .as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(rel < 1e-9, s"dot/cosine norm identity violated by $rel")
  }

  test("dot_product and cosine_sim propagate NULL on length mismatch " +
       "and null elements, matching the HOF fold on the full domain") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rows = Seq(
      // (label, a, b) — java.lang.Float arrays so elements can be null
      ("mismatch", Array[java.lang.Float](1f, 2f, 3f),
        Array[java.lang.Float](1f, 2f)),
      ("null_elem", Array[java.lang.Float](1f, null, 3f),
        Array[java.lang.Float](1f, 2f, 3f)),
      ("clean", Array[java.lang.Float](1f, 2f, 3f),
        Array[java.lang.Float](4f, 5f, 6f)))
    val df = rows.toDF("label", "x", "y")
    val hofDot = expr("""aggregate(
      zip_with(x, y, (a, b) -> cast(a as double) * cast(b as double)),
      cast(0.0 as double), (acc, v) -> acc + v)""")
    val out = df.select(col("label"),
        expr("dot_product(x, y)").as("nd"), hofDot.as("hd"),
        expr("cosine_sim(x, y)").as("nc"))
      .collect().map(r => r.getString(0) ->
        ((r.isNullAt(1), r.isNullAt(2), r.isNullAt(3)))).toMap
    // codegen path: native null iff HOF null; cosine same domain
    assert(out("mismatch") == ((true, true, true)), out.toString)
    assert(out("null_elem") == ((true, true, true)), out.toString)
    assert(out("clean") == ((false, false, false)), out.toString)
    // interpreted path (Literal eval, no codegen): same nulls
    def lit(a: Array[java.lang.Float]) = Literal.create(
      a.map(v => if (v == null) null else v.floatValue()),
      ArrayType(FloatType, containsNull = true))
    rows.foreach { case (label, a, b) =>
      val d = graft.functions.expressions.DotProduct(lit(a), lit(b)).eval(null)
      val c = graft.functions.expressions.CosineSimilarity(lit(a), lit(b)).eval(null)
      val wantNull = label != "clean"
      assert((d == null) == wantNull && (c == null) == wantNull,
        s"interpreted $label: dot=$d cos=$c")
    }
  }

  test("independently built SrpBuckets/PolyHash canonicalize as equal") {
    import graft.operators.Similarity._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
    // content-based equals/hashCode is what lets Catalyst reuse
    // subexpressions and exchanges across separately constructed plans
    // (an Array-typed field compares by reference and defeats both);
    // literal children isolate the plane/param comparison
    val vec = Literal.create(Array.fill(64)(0.5f), ArrayType(FloatType))
    def srp = graft.functions.expressions.SrpBuckets(
      vec, lshPlanes.map(_.map(identity)), LshTables, LshBits)
    val (s1, s2) = (srp, srp)
    assert(s1 == s2 && s1.hashCode == s2.hashCode,
      "structurally identical SrpBuckets compare unequal")
    assert(s1.semanticEquals(s2), "semanticEquals failed on equal SrpBuckets")
    def ph = graft.functions.expressions.PolyHash(
      Literal.create("abc", StringType), 131L, 2147483647L)
    val (p1, p2) = (ph, ph)
    assert(p1 == p2 && p1.semanticEquals(p2))
  }

  test("native srp_buckets == composed HOF srpBucket, bit for bit") {
    import graft.operators.Similarity._
    val e = Tables.load(spark, sfDir, "embeddings")
    val native = e.select(col("vec_id"),
      GraftFunctions.srpBuckets(col("embedding"), lshPlanes, LshTables, LshBits)
        .as("b"))
    val hofCols = (0 until LshTables).map { t =>
      VectorFunctions.srpBucket(
        lshPlanes.slice(t * LshBits, (t + 1) * LshBits), col("embedding"))
    }
    val hof = e.select(col("vec_id"), array(hofCols: _*).as("b"))
    val joined = native.as("n").join(hof.as("h"), Seq("vec_id"))
      .filter(col("n.b") =!= col("h.b"))
    assert(joined.count() == 0, "fused and composed SRP buckets disagree")
  }

  test("srp_buckets survives the interpreted (non-codegen) path") {
    import graft.operators.Similarity._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    // interpreted eval on a literal vector vs the codegen'd DataFrame path
    import spark.implicits._
    val vec = Array.tabulate(64)(i => (math.sin(i + 1)).toFloat)
    val fromDf = Seq(Tuple1(vec)).toDF("v")
      .select(GraftFunctions.srpBuckets(col("v"), lshPlanes, LshTables, LshBits))
      .head().getSeq[Long](0)
    val expr = graft.functions.expressions.SrpBuckets(
      Literal.create(vec, ArrayType(FloatType)),
      lshPlanes, LshTables, LshBits)
    val interp = expr.eval(null)
      .asInstanceOf[ArrayData].toLongArray().toSeq
    assert(fromDf == interp, s"codegen $fromDf != interpreted $interp")
  }

  test("cosine_sim is registered and callable from SQL") {
    GraftFunctions.ensureRegistered(spark)
    Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("emb_t")
    val r = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_t LIMIT 5").collect()
    assert(r.forall(row => math.abs(row.getDouble(0) - 1.0) < 1e-12))
  }

  test("registration is per-session and idempotent") {
    val s2 = spark.newSession()
    GraftFunctions.ensureRegistered(s2)
    GraftFunctions.ensureRegistered(s2)
    assert(s2.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim")))
  }
}
