package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sinks.JdbcUpsertSink
import graft.weather.Weather

/** S6's literal form: batched keyed upsert over JDBC, spec'd against
  * embedded Derby (the only SQL store in this sandbox; the jars ship with
  * Spark). Asserts the `ON CONFLICT DO UPDATE` contract of
  * load_to_postgres.py:90-102: insert-new, update-existing, idempotent.
  */
class JdbcUpsertSinkSpec extends SparkSpec {

  private lazy val dbUrl: String = {
    val dir = Files.createTempDirectory("derby").toString
    s"jdbc:derby:$dir/stagingdb"
  }

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(s"$dbUrl;create=true")
    try f(c) finally c.close()
  }

  private def setup(): Unit = {
    withConn { c =>
      val st = c.createStatement()
      st.executeUpdate(
        """CREATE TABLE weather_staging (
          |  city VARCHAR(1024) NOT NULL,
          |  ts TIMESTAMP NOT NULL,
          |  temperature_2m DOUBLE,
          |  ingested_at TIMESTAMP,
          |  PRIMARY KEY (city, ts))""".stripMargin)
      st.close()
    }
    JdbcUpsertSink.Connections.register("derby-test",
      () => DriverManager.getConnection(dbUrl))
  }

  private def batch(rows: Seq[(String, String, Double, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("city", "ts_s", "temperature_2m", "ing_s")
      .select(col("city"), col("ts_s").cast("timestamp").as("ts"),
        col("temperature_2m"), col("ing_s").cast("timestamp").as("ingested_at"))
  }

  private def tableRows(): Set[(String, String, Double)] = withConn { c =>
    val rs = c.createStatement()
      .executeQuery("SELECT city, ts, temperature_2m FROM weather_staging")
    val buf = scala.collection.mutable.Set.empty[(String, String, Double)]
    while (rs.next()) buf += ((rs.getString(1), rs.getTimestamp(2).toString,
      rs.getDouble(3)))
    buf.toSet
  }

  test("JDBC upsert inserts new keys, updates existing ones, idempotently") {
    setup()
    val first = batch(Seq(
      ("Warsaw", "2025-10-31 10:00:00", 15.5, "2025-10-31 12:05:00"),
      ("Warsaw", "2025-10-31 11:00:00", 15.7, "2025-10-31 12:05:00"),
      ("Berlin", "2025-10-31 10:00:00", 16.8, "2025-10-31 12:05:00")))
    JdbcUpsertSink.upsert(first, "derby-test", "weather_staging",
      Seq("city", "ts"), JdbcUpsertSink.AnsiDialect, batchSize = 2)
    assert(tableRows() == Set(
      ("Warsaw", "2025-10-31 10:00:00.0", 15.5),
      ("Warsaw", "2025-10-31 11:00:00.0", 15.7),
      ("Berlin", "2025-10-31 10:00:00.0", 16.8)))
    // re-ingest: corrected Warsaw 10:00 — conflict path must UPDATE
    val second = batch(Seq(
      ("Warsaw", "2025-10-31 10:00:00", 16.1, "2025-10-31 13:05:00"),
      ("Paris", "2025-10-31 10:00:00", 18.0, "2025-10-31 13:05:00")))
    JdbcUpsertSink.upsert(second, "derby-test", "weather_staging",
      Seq("city", "ts"), JdbcUpsertSink.AnsiDialect)
    val afterSecond = tableRows()
    assert(afterSecond == Set(
      ("Warsaw", "2025-10-31 10:00:00.0", 16.1),
      ("Warsaw", "2025-10-31 11:00:00.0", 15.7),
      ("Berlin", "2025-10-31 10:00:00.0", 16.8),
      ("Paris", "2025-10-31 10:00:00.0", 18.0)))
    // idempotency: re-applying the same batch is a no-op
    JdbcUpsertSink.upsert(second, "derby-test", "weather_staging",
      Seq("city", "ts"), JdbcUpsertSink.AnsiDialect)
    assert(tableRows() == afterSecond)
  }

  test("a gated weather batch flows end-to-end into the JDBC staging table") {
    // reuse the table from the previous test's setup (suite runs in order)
    val s = spark
    import s.implicits._
    val raw = Weather.fixturePayloads
      .toDF("city", "_ingested_at_s", "raw_json")
      .select(col("city"),
        col("_ingested_at_s").cast("timestamp").as("_ingested_at"),
        from_json(col("raw_json"), Weather.RawWeatherSchema).as("p"))
      .select(col("city"), col("_ingested_at"), col("p.*"))
    val staged = Weather.dedupUpsert(Weather.clean(Weather.explodeHourly(raw)))
      .select(col("city"), col("timestamp").as("ts"),
        col("temperature_2m"), col("_ingested_at").as("ingested_at"))
    JdbcUpsertSink.upsert(staged, "derby-test", "weather_staging",
      Seq("city", "ts"), JdbcUpsertSink.AnsiDialect)
    // 4 cities × 3 hours; the corrected Warsaw noon value (16.1) must win
    val rows = tableRows()
    assert(rows.size == 12) // every prior key is within the 12 fixture keys
    assert(rows.contains(("Warsaw", "2025-10-31 12:00:00.0", 16.1)))
  }

  /** Wrap a real Derby connection so every PreparedStatement.executeBatch
    * still executes, but reports Statement.SUCCESS_NO_INFO (-2) for every
    * statement — the legal JDBC driver behavior that made the naive
    * `count == 0 → INSERT` routing a silent data-loss path.
    */
  private def noInfoConnection(real: java.sql.Connection): java.sql.Connection = {
    import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
    def call(target: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
      try { if (args == null) m.invoke(target) else m.invoke(target, args: _*) }
      catch { case e: InvocationTargetException => throw e.getCause }
    def wrapStatement(st: java.sql.PreparedStatement): java.sql.PreparedStatement = {
      var batched = 0
      val h = new InvocationHandler {
        def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "addBatch" if args == null || args.isEmpty =>
              batched += 1; call(st, m, args)
            case "executeBatch" =>
              val n = batched; batched = 0
              call(st, m, args) // the batch DOES run; only the counts lie
              Array.fill(n)(java.sql.Statement.SUCCESS_NO_INFO)
            case _ => call(st, m, args)
          }
      }
      Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[java.sql.PreparedStatement]), h)
        .asInstanceOf[java.sql.PreparedStatement]
    }
    val h = new InvocationHandler {
      def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
        val out = call(real, m, args)
        if (m.getName == "prepareStatement")
          wrapStatement(out.asInstanceOf[java.sql.PreparedStatement])
        else out
      }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.Connection]), h).asInstanceOf[java.sql.Connection]
  }

  test("AnsiDialect drops no rows under a SUCCESS_NO_INFO-returning driver") {
    // runs after the tests above: Warsaw 10:00 exists, Lisbon/Madrid don't
    JdbcUpsertSink.Connections.register("derby-noinfo",
      () => noInfoConnection(DriverManager.getConnection(dbUrl)))
    val b = batch(Seq(
      ("Warsaw", "2025-10-31 10:00:00", 20.0, "2025-11-01 09:00:00"),
      ("Lisbon", "2025-10-31 10:00:00", 21.5, "2025-11-01 09:00:00"),
      ("Madrid", "2025-10-31 10:00:00", 22.5, "2025-11-01 09:00:00")))
    JdbcUpsertSink.upsert(b, "derby-noinfo", "weather_staging",
      Seq("city", "ts"), JdbcUpsertSink.AnsiDialect, batchSize = 2)
    val rows = tableRows()
    // update leg still lands, and — the regression this spec pins — the
    // new keys are NOT silently swallowed by the unknown batch counts
    assert(rows.contains(("Warsaw", "2025-10-31 10:00:00.0", 20.0)))
    assert(rows.contains(("Lisbon", "2025-10-31 10:00:00.0", 21.5)))
    assert(rows.contains(("Madrid", "2025-10-31 10:00:00.0", 22.5)))
    // idempotent under the same lying driver
    JdbcUpsertSink.upsert(b, "derby-noinfo", "weather_staging",
      Seq("city", "ts"), JdbcUpsertSink.AnsiDialect, batchSize = 2)
    assert(tableRows() == rows)
  }

  test("PostgresDialect renders the reference's ON CONFLICT statement") {
    val schema = batch(Nil).schema
    val JdbcUpsertSink.SingleStatement(sql) = JdbcUpsertSink.PostgresDialect
      .statements("staging.weather_hourly", schema, Seq("city", "ts"))
    assert(sql ==
      "INSERT INTO staging.weather_hourly (city, ts, temperature_2m, ingested_at) " +
        "VALUES (?, ?, ?, ?) ON CONFLICT (city, ts) DO UPDATE SET " +
        "temperature_2m = EXCLUDED.temperature_2m, ingested_at = EXCLUDED.ingested_at")
  }
}
