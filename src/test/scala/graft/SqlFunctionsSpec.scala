package graft

import org.apache.spark.sql.functions._

import graft.functions.{Distances, GraftFunctions, SparseVectors}

/** SQL-registered kernels + sparse vector densify. */
class SqlFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("vec_* kernels callable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 6.0, 3.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql(
      """SELECT vec_manhattan(a, b) AS m, vec_euclidean(a, b) AS e,
        |       vec_cosinesim(a, b) AS cs FROM vecs""".stripMargin).head()
    r.getDouble(0) shouldBe 7.0
    r.getDouble(1) shouldBe 5.0
    r.getDouble(2) shouldBe (25.0 / (math.sqrt(14) * math.sqrt(61)) +- Epsilon)
  }

  test("st_* geometry surface callable from SQL") {
    GraftFunctions.register(spark)
    // struct outputs (centroid/envelope) extract through one projection
    // level — the bridged builder's type resolves with the inner SELECT
    val r = spark.sql(
      """SELECT a, p, c.x AS cx, env.xmax AS xmax, c_in, c_out, ix, xa FROM (
        |SELECT st_area('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS a,
        |       st_perimeter('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS p,
        |       st_centroid('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS c,
        |       st_envelope('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS env,
        |       st_contains('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', 2.0, 2.0) AS c_in,
        |       st_contains('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', 9.0, 2.0) AS c_out,
        |       st_intersects('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))',
        |                     'POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))') AS ix,
        |       st_intersection_area('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))',
        |                            'POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))') AS xa)
        |""".stripMargin).head()
    r.getDouble(0) shouldBe 16.0
    r.getDouble(1) shouldBe 16.0
    r.getDouble(2) shouldBe 2.0
    r.getDouble(3) shouldBe 4.0
    r.getBoolean(4) shouldBe true
    r.getBoolean(5) shouldBe false
    r.getBoolean(6) shouldBe true
    r.getDouble(7) shouldBe 4.0
  }

  test("signature kernels callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT simhash(transform(split('a b c', ' '), t -> xxhash64(t))) AS sh,
        |       size(minhash_sig(transform(split('a b c d', ' '), t -> xxhash64(t)), 3, 8)) AS ms,
        |       size(shingle_hashes(transform(split('a b c d', ' '), t -> xxhash64(t)), 3)) AS ns
        |""".stripMargin).head()
    r.getLong(0) should not be 0L
    r.getInt(1) shouldBe 8
    r.getInt(2) shouldBe 2 // 4 tokens -> 2 trigram shingles
  }

  test("repetition_stats callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT repetition_stats(split('x y x y', ' ')) AS st").head().getStruct(0)
    r.getAs[Long]("token_cnt") shouldBe 4L
    r.getAs[Long]("distinct_toks") shouldBe 2L
    r.getAs[Long]("top_cnt") shouldBe 2L
    r.getAs[Long]("bigram_cnt") shouldBe 3L
    r.getAs[Long]("distinct_bigrams") shouldBe 2L
  }

  test("bounded_topk callable from SQL as a grouped aggregate") {
    GraftFunctions.register(spark)
    (1L to 20L).map(i => (i % 2, i, (i % 5).toDouble))
      .toDF("g", "id", "d").createOrReplaceTempView("scored")
    val rows = spark.sql(
      """SELECT g, t.id, t.distance
        |FROM (SELECT g, bounded_topk(d, id, 2) AS tops FROM scored GROUP BY g)
        |LATERAL VIEW explode(tops) AS t
        |ORDER BY g, t.distance, t.id""".stripMargin).collect()
    rows.length shouldBe 4
    // group 0: ids 10, 20 have d=0; group 1: ids 5, 15 have d=0
    rows.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((0L, 10L), (0L, 20L), (1L, 5L), (1L, 15L))
  }

  test("bounded_topk from SQL casts int distance/id inputs") {
    GraftFunctions.register(spark)
    Seq((0, 1, 5), (0, 2, 3), (0, 3, 9)).toDF("g", "id", "d")
      .createOrReplaceTempView("int_scored")
    val rows = spark.sql(
      """SELECT t.id FROM (SELECT g, bounded_topk(d, id, 2) AS tops
        |                  FROM int_scored GROUP BY g)
        |LATERAL VIEW explode(tops) AS t ORDER BY t.distance""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    rows shouldBe Seq(2L, 1L)
  }

  test("densify restores sparsified vectors; distances agree") {
    val dense = Seq((1L, Seq(0.0f, 2.5f, 0.0f, 1.5f)), (2L, Seq(1.0f, 0.0f, 0.0f, 3.0f)))
      .toDF("id", "vec")
    val sparse = dense.select(col("id"), struct(
      filter(zip_with(col("vec"), sequence(lit(0), org.apache.spark.sql.functions.size(col("vec")) - 1),
        (v, i) => struct(v.as("v"), i.as("i"))), s => s.getField("v") =!= 0.0f)
        .as("z")).as("tmp"))
      .select(col("id"), struct(
        transform(col("tmp.z"), _.getField("i")).as("indices"),
        transform(col("tmp.z"), _.getField("v")).as("values"),
        lit(4).as("length")).as("svec"))
    val back = sparse.select(col("id"), SparseVectors.densify(col("svec")).as("vec"))
    val orig = dense.orderBy("id").collect().map(_.getSeq[Float](1))
    val rest = back.orderBy("id").collect().map(_.getSeq[Float](1))
    rest.toSeq shouldBe orig.toSeq

    val q = Distances.vecLit(Seq(1.0, 1.0, 1.0, 1.0))
    val d1 = dense.select(Distances.manhattan(col("vec"), q)).collect().map(_.getDouble(0))
    val d2 = back.select(Distances.manhattan(col("vec"), q)).collect().map(_.getDouble(0))
    d2.toSeq shouldBe d1.toSeq
  }

  test("sparse kernels callable from SQL") {
    GraftFunctions.register(spark)
    // sparse (0, 2, 0, -3) in a 4-dim space
    Seq((Seq(1, 3), Seq(2.0, -3.0), 4)).toDF("indices", "values", "length")
      .selectExpr("struct(indices, values, length) AS sv")
      .createOrReplaceTempView("sparsevecs")
    val r = spark.sql(
      """SELECT sparse_manhattan(sv, array(1.0D, 1.0D, 1.0D, 1.0D)) AS m,
        |       sparse_euclidean(sv, array(0.0D, 2.0D, 0.0D, -3.0D)) AS self,
        |       sparse_minkowski(sv, array(1.0D, 1.0D, 1.0D, 1.0D), 1.0D) AS mk1,
        |       sparse_pair_dot(sv, sv) AS dd FROM sparsevecs""".stripMargin).head()
    r.getDouble(0) shouldBe (1.0 + 1.0 + 1.0 + 4.0) +- Epsilon
    r.getDouble(1) shouldBe 0.0 +- Epsilon
    r.getDouble(2) shouldBe r.getDouble(0) +- Epsilon // minkowski-1 == manhattan
    r.getDouble(3) shouldBe (4.0 + 9.0) +- Epsilon
    // the NATURAL literal forms: bare decimals parse as DECIMAL and
    // must fold, and minkowski without its p must be an arity error,
    // not a silent euclidean
    spark.sql("SELECT sparse_manhattan(sv, array(1.0, 1.0, 1.0, 1.0)) FROM sparsevecs")
      .head().getDouble(0) shouldBe r.getDouble(0) +- Epsilon
    spark.sql("SELECT sparse_minkowski(sv, array(1.0, 1.0, 1.0, 1.0), 1.5) FROM sparsevecs")
      .head().getDouble(0) should be > 0.0
    an[Exception] should be thrownBy
      spark.sql("SELECT sparse_minkowski(sv, array(1.0, 1.0, 1.0, 1.0)) FROM sparsevecs").head()
  }

  test("densify works from SQL too") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT densify(named_struct(
        |  'indices', array(1, 3), 'values', array(CAST(2.5 AS FLOAT), CAST(1.5 AS FLOAT)),
        |  'length', 4)) AS v""".stripMargin).head().getSeq[Float](0)
    r shouldBe Seq(0.0f, 2.5f, 0.0f, 1.5f)
  }
}
