package graft.sources

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession

/** Live JDBC extract path against embedded Derby (ships in
  * /opt/spark/jars): the S1/S2 point scan with database-side predicate
  * pushdown and the parallel range-partitioned scan — executable, not
  * just plan-shaped.
  */
class JdbcSourceSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private val url = "jdbc:derby:memory:jdbcsrc;create=true"
  private lazy val conn = {
    Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("CREATE TABLE studies (id INT PRIMARY KEY, kf_id VARCHAR(32), name VARCHAR(64))")
    (0 until 50).foreach(i =>
      st.execute(s"INSERT INTO studies VALUES ($i, 'SD_$i', 'Study $i')"))
    c.close()
    Jdbc.Conn(url, new java.util.Properties())
  }

  test("point scan returns the row and pushes the predicate into the database") {
    val df = Jdbc.pointScan(spark, conn, "studies", "KF_ID", "SD_7")
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("NAME") == "Study 7")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(KF_ID,SD_7)"),
      s"predicate not pushed to JDBC:\n$plan")
  }

  test("partitioned scan splits the key range across tasks and loses no rows") {
    val df = Jdbc.partitionedScan(spark, conn, "studies", "ID", 0L, 50L, 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 50)
  }

  test("IdCache.fromJdbc reads a live registry table") {
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("""CREATE TABLE idmap ("key" VARCHAR(32), "resolved_id" VARCHAR(32))""")
    st.execute("""INSERT INTO idmap VALUES ('PT_1', 'srv-1'), ('PT_2', 'srv-2')""")
    c.close()
    val got = graft.sinks.IdCache.fromJdbc(spark, url, "idmap")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("PT_1" -> "srv-1", "PT_2" -> "srv-2"))
  }
}
