package graft.sinks

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The Postgres-sink variant of S7 (SURVEY §2.1): a staged, batched
  * `INSERT … ON CONFLICT (key) DO UPDATE` over `foreachPartition` — the
  * idempotent keyed upsert without per-row HTTP.
  *
  * Scale design: one connection + one PreparedStatement per partition,
  * `addBatch`/`executeBatch` every `batchSize` rows, autocommit off with
  * one commit per batch. Partition-parallel across executors; task
  * retries are safe because the statement is a keyed upsert. Repartition
  * the input to size the connection count (#partitions = #connections —
  * on a 1000-executor cluster, coalesce to what the database can take).
  */
object JdbcUpsertSink {

  final case class Config(
      url: String,
      table: String,
      user: String = "",
      password: String = "",
      batchSize: Int = 500,
      // Class.forName'd on the executor before connecting: raw
      // DriverManager can't see drivers shipped via --jars (classloader
      // visibility), so name the driver explicitly in that deployment
      driverClass: Option[String] = None)

  /** The exact statement submitted per row — split out so tests can pin
    * it without a live database.
    */
  def upsertSql(table: String, keyCol: String, cols: Seq[String]): String = {
    require(cols.contains(keyCol), s"key $keyCol must be among $cols")
    require(cols.exists(_ != keyCol),
      "at least one non-key column required (DO UPDATE SET cannot be empty)")
    val names = cols.mkString(", ")
    val binds = cols.map(_ => "?").mkString(", ")
    val sets = cols.filterNot(_ == keyCol)
      .map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO $table ($names) VALUES ($binds) " +
      s"ON CONFLICT ($keyCol) DO UPDATE SET $sets"
  }

  /** Upsert (key, resource_type, resource_json) rows. `connect` is
    * injectable for tests; defaults to DriverManager on config.url.
    * Input is de-duplicated by key first: Postgres rejects a statement
    * batch that touches the same conflict key twice ("cannot affect row
    * a second time"), which would make retries fail identically.
    */
  def upsert(docs: DataFrame, config: Config,
      keyCol: String = "key", typeCol: String = "resource_type",
      jsonCol: String = "resource_json",
      connect: Config => Connection = defaultConnect): Unit = {
    val sql = upsertSql(config.table, keyCol, Seq(keyCol, typeCol, jsonCol))
    val (batchSize, cfg) = (config.batchSize, config)
    docs.select(col(keyCol), col(typeCol), col(jsonCol))
      .dropDuplicates(keyCol)
      .foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conn = connect(cfg)
        try {
          conn.setAutoCommit(false)
          val stmt = conn.prepareStatement(sql)
          var inBatch = 0
          rows.foreach { r =>
            stmt.setString(1, r.getString(0))
            stmt.setString(2, r.getString(1))
            stmt.setString(3, r.getString(2))
            stmt.addBatch()
            inBatch += 1
            if (inBatch >= batchSize) {
              stmt.executeBatch(); conn.commit(); inBatch = 0
            }
          }
          if (inBatch > 0) { stmt.executeBatch(); conn.commit() }
          stmt.close()
        } finally conn.close()
    }
  }

  private def defaultConnect(c: Config): Connection = {
    c.driverClass.foreach(Class.forName)
    DriverManager.getConnection(c.url, c.user, c.password)
  }
}
