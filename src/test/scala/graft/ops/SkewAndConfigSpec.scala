package graft.ops

import graft.SparkSpec
import graft.etl.ConfigLoader

class SkewAndConfigSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin produces exactly the rows of the unsalted join") {
    // skewed fact: 90% of rows share key 1
    val fact = ((1 to 90).map(i => (1L, s"r$i")) ++ (1 to 10).map(i => (i.toLong + 1, s"s$i")))
      .toDF("k", "payload")
    val dim = (1 to 11).map(i => (i.toLong, s"d$i")).toDF("dk", "attr")
    val plain = fact.join(dim, fact("k") === dim("dk")).select("k", "payload", "attr")
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", nSalts = 4,
      factSaltBy = Seq("payload")).select("k", "payload", "attr")
    assert(rowSet(salted) == rowSet(plain))
    assert(salted.count() == plain.count())
  }

  test("skewReport matches the hand-computed distribution") {
    // per-key counts 1,1,2,4 → n=8 rows over 4 keys; ascending-rank
    // weighted sum Σi·cᵢ = 1+2+6+16 = 25 → gini = (50−5·8)/(4·8) = 0.3125;
    // n·Σc²−(Σc)² = 4·22−64 = 24 → cv = √24/8
    val df = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(2)("c") ++
      Seq.fill(4)("d")).toDF("k")
    val r = Skew.skewReport(df, Seq("k")).collect().head
    assert(r.getAs[Long]("n_rows") == 8L && r.getAs[Long]("n_keys") == 4L &&
      r.getAs[Long]("max_cnt") == 4L)
    assert(r.getAs[Double]("avg_cnt") == 2.0 && r.getAs[Double]("top_share") == 0.5)
    assert(r.getAs[Double]("gini") == 0.3125, r.toString)
    assert(r.getAs[Double]("cv") == math.rint(math.sqrt(24d) / 8d * 1e6) / 1e6, r.toString)
  }

  test("skewReport: a uniform key distribution has zero gini and zero cv") {
    val df = Seq("a", "a", "b", "b", "c", "c").toDF("k")
    val r = Skew.skewReport(df, Seq("k")).collect().head
    assert(r.getAs[Double]("gini") == 0.0 && r.getAs[Double]("cv") == 0.0, r.toString)
    assert(r.getAs[Double]("top_share") == math.rint(2d / 6d * 1e6) / 1e6)
  }

  test("joinSizeEstimate predicts the EXACT join cardinality and names the hottest key") {
    val l = Seq("a", "a", "b", "c", "c", "c").toDF("lk")
    val r = Seq("a", "a", "a", "b", "d", "d").toDF("rk")
    val est = Skew.joinSizeEstimate(l, "lk", r, "rk").collect().head
    val actual = l.join(r, l("lk") === r("rk")).count()
    assert(est.getAs[Long]("est_rows") == actual && actual == 7L, est.toString)
    assert(est.getAs[Long]("left_rows") == 6L && est.getAs[Long]("right_rows") == 6L)
    assert(est.getAs[Long]("left_keys") == 3L && est.getAs[Long]("right_keys") == 3L)
    assert(est.getAs[Long]("matched_keys") == 2L)
    assert(est.getAs[Long]("max_key_rows") == 6L) // key a: 2x3
    assert(est.getAs[Double]("top_share") == 0.857143, est.toString) // 6/7
  }

  test("joinSizeEstimate: disjoint key sets predict zero without dividing by it") {
    val l = Seq("a").toDF("lk")
    val r = Seq("b").toDF("rk")
    val est = Skew.joinSizeEstimate(l, "lk", r, "rk").collect().head
    assert(est.getAs[Long]("est_rows") == 0L && est.getAs[Long]("max_key_rows") == 0L &&
      est.getAs[Double]("top_share") == 0.0, est.toString)
  }

  test("salt is deterministic across evaluations") {
    val df = (1 to 50).map(i => Tuple1(s"row$i")).toDF("id")
    val a = df.select(Skew.salt(8, df("id")).as("s")).collect().map(_.getInt(0)).toSeq
    val b = df.select(Skew.salt(8, df("id")).as("s")).collect().map(_.getInt(0)).toSeq
    assert(a == b)
    assert(a.toSet.size > 1) // actually spreads
  }

  test("SessionFactory applies cluster defaults, extra overrides win") {
    val s = graft.etl.SessionFactory.build("graft-test", shufflePartitions = 4,
      extra = Map("spark.sql.files.maxPartitionBytes" -> "134217728"))
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(s.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(s.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true")
    assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(s.conf.get("spark.sql.files.maxPartitionBytes") == "134217728")
  }

  test("ConfigLoader parses the reference JSON shape") {
    val cfg = ConfigLoader.fromString("""
      {
        "transform": {"default": [154992], "type1": [-48],
                      "type2": [155138], "type3": [4550]},
        "mysql": {"insert": true,
          "load": {"url": "jdbc:mysql://h/db", "driver": "d",
                   "dbtable": "EP_INFO_VIEW", "user": "u", "password": "p"},
          "save": {"url": "jdbc:mysql://h/db", "driver": "d",
                   "dbtable": "ETL_RESULT", "user": "u", "password": "p"}},
        "file": {"write": false,
          "load": {"path": "/data/in"}, "save": {"path": "/data/out"}}
      }""")
    assert(cfg.types.default == Seq("154992")) // int ids normalized to strings
    assert(cfg.types.type1 == Seq("-48"))
    assert(cfg.dbInsert && !cfg.fileWrite)
    assert(cfg.loadDb.get.table == "EP_INFO_VIEW")
    assert(cfg.saveDb.get.table == "ETL_RESULT")
    assert(cfg.loadPath == "/data/in")
  }

  test("ConfigLoader.discover finds *config.json in a SparkFiles-style root dir") {
    val dir = java.nio.file.Files.createTempDirectory("sparkfiles-root")
    java.nio.file.Files.writeString(dir.resolve("unrelated.txt"), "noise")
    java.nio.file.Files.writeString(dir.resolve("etl_config.json"),
      """{"file": {"write": true, "load": {"path": "/discovered/in"},
         "save": {"path": "/discovered/out"}}}""")
    val cfg = ConfigLoader.discover(dir.toString)
    assert(cfg.isDefined, "suffix scan must find etl_config.json")
    assert(cfg.get.loadPath == "/discovered/in" && cfg.get.fileWrite)
    // no config shipped → None, caller falls back to defaults
    val empty = java.nio.file.Files.createTempDirectory("sparkfiles-empty")
    assert(ConfigLoader.discover(empty.toString).isEmpty)
    // deterministic choice when several match: lexicographically first
    java.nio.file.Files.writeString(dir.resolve("aaa_config.json"),
      """{"file": {"write": false, "load": {"path": "/first/in"}, "save": {"path": "/o"}}}""")
    assert(ConfigLoader.discover(dir.toString).get.loadPath == "/first/in")
  }
}
