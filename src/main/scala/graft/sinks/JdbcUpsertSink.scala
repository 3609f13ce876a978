package graft.sinks

import java.sql.{Connection, Statement}
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** The LITERAL form of the reference's staging sink — batched keyed upsert
  * over JDBC (load_to_postgres.py:90-102: `INSERT … ON CONFLICT
  * (city, timestamp) DO UPDATE`, executed in executemany batches) — next to
  * the functional parquet equivalents (WeatherJobs.upsertParquet /
  * mergeUpsertParquet).
  *
  * Executor-side and distributed: each input partition opens one
  * connection from the [[JdbcUpsertSink.Connections]] registry (the same
  * injectable-seam pattern as OpenMeteoV2Source.Transports — production
  * registers a real driver/pool, tests register embedded Derby; the sink
  * itself never touches a socket) and applies its rows as JDBC batches of
  * `batchSize`, one transaction per partition.
  *
  * Contract (matching the reference): within a batch the caller dedups per
  * key first (Weather.dedupUpsert) — the reference applies one file at a
  * time, so per-batch key uniqueness is its invariant too; across batches,
  * last applied wins, which with `_ingested_at`-ordered batches is
  * last-write-wins.
  */
object JdbcUpsertSink {

  /** Executor-visible connection-factory registry. Local mode shares the
    * JVM; a cluster deployment registers the factory in an executor plugin.
    */
  object Connections {
    private val registry = TrieMap.empty[String, () => Connection]
    def register(name: String, fn: () => Connection): Unit = registry(name) = fn
    def apply(name: String): Connection = registry.getOrElse(name,
      throw new IllegalArgumentException(
        s"JdbcUpsertSink: no connection factory registered under '$name'")).apply()
  }

  /** How a store expresses "insert or update by key". */
  sealed trait UpsertStatements extends Serializable
  /** One native upsert statement, parameters in column order. */
  final case class SingleStatement(sql: String) extends UpsertStatements
  /** Portable two-step: batched UPDATE (params: non-keys then keys), then
    * batched INSERT (params: all columns) for the rows the UPDATE missed
    * (per-statement update count 0; a SUCCESS_NO_INFO count is resolved by
    * re-applying that row's UPDATE singly before deciding).
    */
  final case class UpdateThenInsert(updateSql: String, insertSql: String)
      extends UpsertStatements

  trait Dialect extends Serializable {
    def statements(table: String, schema: StructType, keys: Seq[String]): UpsertStatements
  }

  /** PostgreSQL `INSERT … ON CONFLICT … DO UPDATE` — byte-for-byte the
    * reference's statement shape (load_to_postgres.py:90-102).
    */
  object PostgresDialect extends Dialect {
    def statements(table: String, schema: StructType, keys: Seq[String]): UpsertStatements = {
      val cols = schema.fieldNames.toSeq
      val nonKeys = cols.filterNot(keys.contains)
      SingleStatement(
        s"INSERT INTO $table (${cols.mkString(", ")}) " +
          s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
          s"ON CONFLICT (${keys.mkString(", ")}) DO UPDATE SET " +
          nonKeys.map(c => s"$c = EXCLUDED.$c").mkString(", "))
    }
  }

  /** ANSI update-then-insert — runs on any SQL store (Derby rejects both
    * `ON CONFLICT` and a `VALUES` row source under MERGE, so the portable
    * form is the two-step). Same per-key result as the native upsert for
    * key-unique batches (the documented caller contract).
    */
  object AnsiDialect extends Dialect {
    def statements(table: String, schema: StructType, keys: Seq[String]): UpsertStatements = {
      val cols = schema.fieldNames.toSeq
      val nonKeys = cols.filterNot(keys.contains)
      UpdateThenInsert(
        s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} " +
          s"WHERE ${keys.map(k => s"$k = ?").mkString(" AND ")}",
        s"INSERT INTO $table (${cols.mkString(", ")}) " +
          s"VALUES (${cols.map(_ => "?").mkString(", ")})")
    }
  }

  /** Upsert every row of `df` into `table`, keyed by `keys`. One
    * connection + one transaction per input partition; statements applied
    * in JDBC batches of `batchSize` (the reference's executemany page
    * size, load_to_postgres.py:100).
    */
  def upsert(df: DataFrame, connName: String, table: String, keys: Seq[String],
      dialect: Dialect, batchSize: Int = 500): Unit = {
    val schema = df.schema
    val missing = keys.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty, s"key columns not in frame: $missing")
    val stmts = dialect.statements(table, schema, keys)
    val cols = schema.fieldNames.toSeq
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val nonKeyIdx = cols.filterNot(keys.contains).map(schema.fieldIndex).toArray
    val n = schema.length
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = Connections(connName)
        try {
          conn.setAutoCommit(false)
          stmts match {
            case SingleStatement(sql) =>
              val st = conn.prepareStatement(sql)
              try {
                var pending = 0
                rows.foreach { r =>
                  var i = 0
                  while (i < n) { st.setObject(i + 1, r.get(i)); i += 1 }
                  st.addBatch()
                  pending += 1
                  if (pending == batchSize) { st.executeBatch(); pending = 0 }
                }
                if (pending > 0) st.executeBatch()
              } finally st.close()
            case UpdateThenInsert(updateSql, insertSql) =>
              val up = conn.prepareStatement(updateSql)
              val ins = conn.prepareStatement(insertSql)
              try {
                rows.grouped(batchSize).foreach { group =>
                  group.foreach { r =>
                    var p = 1
                    nonKeyIdx.foreach { i => up.setObject(p, r.get(i)); p += 1 }
                    keyIdx.foreach { i => up.setObject(p, r.get(i)); p += 1 }
                    up.addBatch()
                  }
                  val counts = up.executeBatch()
                  var inserts = 0
                  group.iterator.zip(counts.iterator).foreach { case (r, c) =>
                    // JDBC drivers may legally report SUCCESS_NO_INFO (-2)
                    // for every statement in a batch. Treating that as
                    // "updated" would silently drop rows whose key doesn't
                    // exist (the INSERT leg never runs). Unknown counts are
                    // resolved by re-applying that row's UPDATE singly —
                    // idempotent (same key, same SET values under the
                    // key-unique batch contract) and returning a real count.
                    val updated =
                      if (c == Statement.SUCCESS_NO_INFO) {
                        var p = 1
                        nonKeyIdx.foreach { i => up.setObject(p, r.get(i)); p += 1 }
                        keyIdx.foreach { i => up.setObject(p, r.get(i)); p += 1 }
                        up.executeUpdate() > 0
                      } else c > 0
                    if (!updated) {
                      var i = 0
                      while (i < n) { ins.setObject(i + 1, r.get(i)); i += 1 }
                      ins.addBatch()
                      inserts += 1
                    }
                  }
                  if (inserts > 0) ins.executeBatch()
                }
              } finally { up.close(); ins.close() }
          }
          conn.commit()
        } finally conn.close()
      }
    }
  }
}
