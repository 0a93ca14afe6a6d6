package graft.sinks

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Exactly-once micro-batch landing for Structured Streaming
  * (`foreachBatch`) into a transactional database — the production
  * landing path for every streaming op in the engine.
  *
  * Spark's `foreachBatch` contract is at-least-once: after a crash
  * between "sink succeeded" and "engine commit log written", the same
  * `(batchId, data)` is REPLAYED on restart. Two composable defenses:
  *
  *  - [[ledgered]] — a driver-side batch ledger keyed `(sink_id,
  *    batch_id)`: a replayed batch that already committed its ledger
  *    row is SKIPPED wholesale (one indexed probe instead of
  *    re-shipping the whole batch). The residual crash window (apply
  *    done, ledger row not yet committed) replays the apply, so the
  *    wrapped action should itself be idempotent ([[JdbcUpsertSink]]'s
  *    keyed upsert) — together: exactly-once effects, and replays cost
  *    one probe, not one batch.
  *  - [[appendOnce]] — TRUE exactly-once for plain appends (which are
  *    NOT idempotent) without a driver bottleneck: each PARTITION
  *    writes its rows AND its `(sink_id, batch_id, partition_id)`
  *    ledger row in ONE local transaction. A replayed/retried
  *    partition either sees its ledger row (skip) or rolled back
  *    atomically (clean redo); a speculative duplicate attempt loses
  *    the ledger-row PK race and rolls back. No cross-partition
  *    coordination, so it scales partition-parallel like any
  *    `foreachPartition` sink — the transaction is per partition, the
  *    pattern Kafka-to-JDBC exactly-once pipelines use.
  *
  * Scale notes: ledger probes are PK point reads; the ledger grows one
  * row per batch (driver form) or per batch×partition (append form) —
  * prune it like any ops table. #partitions = #connections; coalesce
  * upstream to what the database can take, exactly as
  * [[JdbcUpsertSink.upsert]] documents.
  */
object ExactlyOnceSink {

  /** Ledger location. `table`/columns are quoted ANSI identifiers —
    * works on Derby/Postgres/DB2 alike.
    */
  final case class Ledger(
      url: String,
      user: String = "",
      password: String = "",
      driverClass: Option[String] = None,
      table: String = "graft_batch_ledger")

  private def q(c: String) = "\"" + c + "\""

  /** Version of the deterministic row→partition assignment
    * [[appendOnce]] uses. Partition-level skip is only sound when a
    * replayed batch reproduces every partition byte-for-byte, so the
    * assignment function is part of the ledger's correctness contract:
    * a batch partially committed under one scheme and resumed under
    * another would double-write some rows and drop others. Every
    * per-partition ledger row records the scheme it was written under,
    * and [[appendOnce]] REFUSES to resume a batch whose existing rows
    * carry a different version — resolve by draining/rolling back the
    * partial batch under the old build, never by mixing schemes.
    *
    * History: 1 = separator-joined `concat_ws` hash (collision- and
    * skew-prone); 2 = multi-arg `xxhash64` over the columns
    * (boundary-aware, uniform). Ledgers created before versioning
    * migrate with scheme 0 ("unknown"), which conservatively conflicts
    * with everything.
    *
    * Upgrade recovery: Structured Streaming replays the LAST batch on
    * restart even when it fully landed (the crash window between sink
    * success and the engine's commit log), so the first restart after
    * an upgrade can replay a batch whose ledger rows all carry the old
    * scheme. The refusal is still the right default — the sink cannot
    * distinguish "fully committed under the old scheme" from "old
    * build crashed mid-batch" without the old build's partition count.
    * The OPERATOR can: if every partition of the batch verifiably
    * landed (row counts match the upstream, or the old build's logs
    * show the batch completing), mark it current with
    * {{{UPDATE <ledger> SET "scheme" = <current>
    *    WHERE "sink_id" = ? AND "batch_id" = ?}}}
    * and restart — the replay then skips every partition. If it did
    * NOT fully land, drain or roll back with the old build, never by
    * mixing schemes.
    */
  private[sinks] val PartitionSchemeVersion = 2

  def defaultConnect(l: Ledger): Connection = {
    l.driverClass.foreach(Class.forName)
    DriverManager.getConnection(l.url, l.user, l.password)
  }

  /** Create the ledger if missing — racing creators are fine (loser's
    * CREATE fails, the subsequent existence probe passes). `perPartition`
    * adds the partition_id PK component used by [[appendOnce]].
    */
  def ensureLedger(conn: Connection, table: String, perPartition: Boolean): Unit = {
    val pidCol = if (perPartition)
      s"${q("partition_id")} INT NOT NULL, ${q("scheme")} INT NOT NULL, " else ""
    val pidPk = if (perPartition) s", ${q("partition_id")}" else ""
    val ddl =
      s"CREATE TABLE $table (${q("sink_id")} VARCHAR(128) NOT NULL, " +
        s"${q("batch_id")} BIGINT NOT NULL, " + pidCol +
        s"${q("applied_at")} TIMESTAMP, " +
        s"PRIMARY KEY (${q("sink_id")}, ${q("batch_id")}$pidPk))"
    try {
      val st = conn.createStatement()
      try st.execute(ddl) finally st.close()
    } catch {
      case e: SQLException =>
        // table may already exist (possibly created by a racing task):
        // probe it; if the probe also fails, the original error stands
        try {
          val st = conn.createStatement()
          try st.executeQuery(s"SELECT count(*) FROM $table WHERE 1=0").close()
          finally st.close()
        } catch { case _: SQLException => throw e }
        if (perPartition) {
          // a table first created by the DRIVER ledger ([[ledgered]],
          // perPartition=false) has no partition_id at all — that is a
          // shape mismatch, not a migration: ALTERing scheme into it
          // would only defer the failure to a confusing column error
          // inside the partition-task INSERT
          val hasPid =
            try {
              val st = conn.createStatement()
              try {
                st.executeQuery(
                  s"SELECT ${q("partition_id")} FROM $table WHERE 1=0").close()
                true
              } finally st.close()
            } catch { case _: SQLException => false }
          if (!hasPid) throw new IllegalStateException(
            s"ledger table $table has the driver-ledger shape (no " +
              "partition_id column — created by ledgered/perPartition=" +
              "false); appendOnce needs a per-partition ledger. Use a " +
              "different table name, or migrate the old ledger manually.")
          // pre-versioning per-partition ledgers lack the scheme column:
          // migrate with DEFAULT 0 ("unknown scheme"), which conflicts
          // with every current scheme — a partial batch written by an
          // old build is refused, not silently mixed
          try {
            val st = conn.createStatement()
            try st.executeQuery(
              s"SELECT ${q("scheme")} FROM $table WHERE 1=0").close()
            finally st.close()
          } catch {
            case _: SQLException =>
              val st = conn.createStatement()
              try st.execute(s"ALTER TABLE $table ADD COLUMN " +
                s"${q("scheme")} INT NOT NULL DEFAULT 0")
              finally st.close()
          }
        }
    }
  }

  private def ledgerHas(conn: Connection, table: String, sinkId: String,
      batchId: Long, pid: Option[Int]): Boolean = {
    val where = pid.map(_ => s" AND ${q("partition_id")} = ?").getOrElse("")
    val ps = conn.prepareStatement(
      s"SELECT 1 FROM $table WHERE ${q("sink_id")} = ? AND ${q("batch_id")} = ?$where")
    try {
      ps.setString(1, sinkId); ps.setLong(2, batchId)
      pid.foreach(p => ps.setInt(3, p))
      val rs = ps.executeQuery()
      try rs.next() finally rs.close()
    } finally ps.close()
  }

  private def ledgerInsert(conn: Connection, table: String, sinkId: String,
      batchId: Long, pid: Option[Int]): Unit = {
    val (cols, binds) = pid match {
      case Some(_) => (s"${q("sink_id")}, ${q("batch_id")}, ${q("partition_id")}, " +
        s"${q("scheme")}, ${q("applied_at")}",
        "?, ?, ?, ?, CURRENT_TIMESTAMP")
      case None => (s"${q("sink_id")}, ${q("batch_id")}, ${q("applied_at")}",
        "?, ?, CURRENT_TIMESTAMP")
    }
    val ps = conn.prepareStatement(s"INSERT INTO $table ($cols) VALUES ($binds)")
    try {
      ps.setString(1, sinkId); ps.setLong(2, batchId)
      pid.foreach { p => ps.setInt(3, p); ps.setInt(4, PartitionSchemeVersion) }
      ps.executeUpdate()
    } finally ps.close()
  }

  /** Refuse to resume a batch whose committed partitions were written
    * under a DIFFERENT partitioning scheme — their pid→rows assignment
    * no longer matches this build's, so skipping them would drop rows
    * and re-writing them would duplicate (the upgrade-across-a-partial-
    * commit hazard [[PartitionSchemeVersion]] documents).
    */
  private def requireSchemeCompatible(conn: Connection, table: String,
      sinkId: String, batchId: Long): Unit = {
    val ps = conn.prepareStatement(
      s"SELECT ${q("scheme")} FROM $table WHERE ${q("sink_id")} = ? AND " +
        s"${q("batch_id")} = ? AND ${q("scheme")} <> ?")
    try {
      ps.setString(1, sinkId); ps.setLong(2, batchId)
      ps.setInt(3, PartitionSchemeVersion)
      val rs = ps.executeQuery()
      try {
        if (rs.next()) throw new IllegalStateException(
          s"batch $batchId of sink '$sinkId' has committed partitions " +
            s"under partitioning scheme ${rs.getInt(1)}, but this build " +
            s"writes scheme $PartitionSchemeVersion; resuming would " +
            "double-write or drop rows. If the old build crashed " +
            "MID-BATCH, finish or roll back the batch with that build. " +
            "If the batch FULLY landed (a replay after an upgrade — " +
            "verify row counts first), mark it current with: UPDATE " +
            s"$table SET ${q("scheme")} = $PartitionSchemeVersion WHERE " +
            s"${q("sink_id")} = '$sinkId' AND ${q("batch_id")} = $batchId " +
            "— the replay will then skip every partition.")
      } finally rs.close()
    } finally ps.close()
  }

  /** Wrap a per-batch action in the driver-side batch ledger: a batch
    * id whose ledger row exists is skipped without touching the data;
    * otherwise `apply` runs, then the ledger row commits. Use as
    * `runAvailableNow(stream, ckpt)(ledgered(ledger, "my-sink")(...))`.
    */
  def ledgered(ledger: Ledger, sinkId: String,
      connect: Ledger => Connection = defaultConnect)(
      apply: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    (df, batchId) =>
      val conn = connect(ledger)
      val applied =
        try {
          conn.setAutoCommit(true)
          ensureLedger(conn, ledger.table, perPartition = false)
          ledgerHas(conn, ledger.table, sinkId, batchId, None)
        } finally conn.close()
      if (!applied) {
        apply(df, batchId)
        val c2 = connect(ledger)
        try {
          c2.setAutoCommit(true)
          ledgerInsert(c2, ledger.table, sinkId, batchId, None)
        } finally c2.close()
      }
  }

  /** Transactional per-partition APPEND: land `cols` (string-typed —
    * cast upstream, as the landing row shape of this engine is
    * string-keyed JSON) into `table`, exactly once per
    * `(sinkId, batchId)` even under batch replay, task retry, or
    * speculative duplicate attempts. Each partition runs ONE local
    * transaction covering its rows plus its partition-ledger row.
    */
  def appendOnce(df: DataFrame, batchId: Long, sinkId: String,
      table: String, cols: Seq[String], ledger: Ledger,
      batchSize: Int = 500, partitions: Int = 16,
      connect: Ledger => Connection = defaultConnect): Unit = {
    require(cols.nonEmpty, "at least one column")
    require(partitions > 0, "fixed partition count required: partition-" +
      "level skip is only sound when the pid->rows assignment replays " +
      "identically (content-hash partitioning below guarantees it; " +
      "round-robin or AQE-chosen partitioning would not)")
    val insertSql = s"INSERT INTO $table (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val ledgerTable = ledger.table
    val led = ledger
    // ensure the ledger exists BEFORE fanning out (partition-level
    // CREATE races are handled too, but one DDL beats 32)
    val c0 = connect(led)
    try {
      c0.setAutoCommit(true)
      ensureLedger(c0, ledgerTable, perPartition = true)
      requireSchemeCompatible(c0, ledgerTable, sinkId, batchId)
    } finally c0.close()
    df.select(cols.map(col): _*)
      // deterministic pid->rows: hash the row content into a FIXED
      // partition count, so a replayed batch reproduces every
      // partition byte-for-byte and the per-partition ledger is sound.
      // Columns hash as SEPARATE xxhash64 args - a separator-joined
      // concat collides rows whose values contain the separator and
      // funnels low-entropy columns into few partitions; multi-arg
      // hashing is boundary-aware, uniform, and replay-deterministic
      .repartition(partitions, org.apache.spark.sql.functions.xxhash64(
        cols.map(col): _*))
      .rdd.mapPartitionsWithIndex { (pid, rows) =>
        val conn = connect(led)
        try {
          conn.setAutoCommit(false)
          if (ledgerHas(conn, ledgerTable, sinkId, batchId, Some(pid))) {
            conn.rollback() // release read locks; this partition landed
          } else {
            val ps = conn.prepareStatement(insertSql)
            try {
              var inBatch = 0
              rows.foreach { r =>
                cols.indices.foreach(i => ps.setString(i + 1, r.getString(i)))
                ps.addBatch()
                inBatch += 1
                // flush the JDBC batch buffer WITHOUT committing — the
                // transaction stays open until the ledger row lands
                if (inBatch >= batchSize) { ps.executeBatch(); inBatch = 0 }
              }
              if (inBatch > 0) ps.executeBatch()
            } finally ps.close()
            try {
              ledgerInsert(conn, ledgerTable, sinkId, batchId, Some(pid))
              conn.commit()
            } catch {
              case e: SQLException if isDuplicateKey(e) =>
                // a concurrent duplicate attempt committed first — its
                // rows are in; ours roll back atomically
                conn.rollback()
            }
          }
        } catch {
          case t: Throwable =>
            try conn.rollback() catch { case _: SQLException => () }
            throw t
        } finally conn.close()
        Iterator.empty
      }.count(): Unit
  }

  private def isDuplicateKey(e: SQLException): Boolean =
    e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
      Option(e.getSQLState).exists(_.startsWith("23"))
}
