package graft.sinks

import java.sql.{Connection, DriverManager}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Real JDBC sink/source family (SURVEY.md §2.2 K1/K2), the
  * connection-backed complement to the parquet modeling in [[SinkOps]]:
  *
  *  - K2 batch insert → `df.write.jdbc` (Spark's JDBC writer: one
  *    connection per partition, batched PreparedStatement inserts —
  *    the distributed form of the reference's 100-row `execute_values`
  *    pages, src/storage/pgvector_storage.py:118-148).
  *  - K1 upsert → distributed update-else-insert per partition in
  *    fixed-size transactional batches — the portable restatement of
  *    `INSERT … ON CONFLICT (vector_id) DO UPDATE`
  *    (src/storage/pgvector_storage.py:86-107). Work distributes as one
  *    pass over the frame; the database serializes conflicting keys.
  *  - Partitioned read-back → `spark.read.jdbc` with a split column +
  *    bounds, so the scan arrives as N parallel range queries, not one
  *    cursor.
  *
  * Tested against embedded Derby (in `/opt/spark/jars`, zero network);
  * the executor-side code holds for any server-addressed JDBC URL —
  * swap the URL and the same plan runs against Postgres/pgvector. In
  * local[*] every "executor" shares the JVM, which is exactly the
  * embedded-Derby visibility model; a multi-node cluster needs a
  * server-mode URL, which is the production case anyway.
  */
object JdbcSink {

  // Derby writes derby.log into user.dir unless told otherwise; keep
  // scratch engine state out of the repo tree.
  locally {
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))
  }

  private val DriverClass = "org.apache.derby.jdbc.EmbeddedDriver"

  def connectionProps: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", DriverClass)
    p
  }

  /** In-memory Derby URL for `name` (creating on first touch). Scoped
    * per logical dataset so concurrent suites/sweeps never share state. */
  def memoryUrl(name: String): String = s"jdbc:derby:memory:$name;create=true"

  private def withConnection[A](url: String)(f: Connection => A): A = {
    Class.forName(DriverClass) // Derby: ensure the driver is registered
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** Driver-side DDL: drop `table` if present, create it with `colsDdl`
    * (e.g. `"k BIGINT NOT NULL PRIMARY KEY, v DOUBLE"`). Idempotent —
    * re-running a pipeline stage must not trip over its last run. */
  def recreateTable(url: String, table: String, colsDdl: String): Unit =
    withConnection(url) { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE $table")
      catch { case _: java.sql.SQLException => () } // no DROP IF EXISTS in Derby
      st.executeUpdate(s"CREATE TABLE $table ($colsDdl)")
      st.close()
    }

  /** Create `table` only if absent (the reference's
    * `CREATE TABLE IF NOT EXISTS`, pgvector_storage.py:86-96) — the
    * standing-pipeline form, where re-runs must find prior state. */
  def ensureTable(url: String, table: String, colsDdl: String): Unit =
    withConnection(url) { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(s"CREATE TABLE $table ($colsDdl)")
      catch {
        case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () // exists
      }
      st.close()
    }

  /** K2: distributed batch insert into an EXISTING table (append mode —
    * Spark batches PreparedStatement rows per partition). */
  def insert(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("append").jdbc(url, table, connectionProps)

  /** Result of an [[upsert]]: rows that updated an existing key vs rows
    * inserted as new keys (reference logs the same split implicitly via
    * ON CONFLICT). */
  final case class UpsertStats(updated: Long, inserted: Long)

  /** K1: distributed last-write-wins upsert. For each row, UPDATE by
    * `keyCol`; 0 rows hit → INSERT. Batches of `batchSize` rows commit
    * together (the reference's 100-row pages); each partition holds one
    * connection. Column order follows `df.columns`; `keyCol` must be one
    * of them.
    *
    * Update-else-insert is not atomic, so two writers of the same key can
    * both observe "absent" and race to INSERT. Two guards make the whole
    * operation safe anyway: the frame is hash-repartitioned on `keyCol`
    * (duplicate keys within one upsert land in the same partition and are
    * applied serially), and an INSERT that still hits a duplicate-key
    * violation (a concurrent external writer, or a task retry re-running
    * rows whose page already committed) falls back to UPDATE — the
    * ON CONFLICT DO UPDATE outcome either way. `UpsertStats` is exact
    * absent task retries; a retried partition may report rows it inserted
    * before the failure as updates. */
  def upsert(df0: DataFrame, url: String, table: String, keyCol: String,
      batchSize: Int = 100): UpsertStats = {
    import org.apache.spark.sql.functions.col
    val df = df0.repartition(col(keyCol))
    val cols = df.columns.toSeq
    require(cols.contains(keyCol), s"key column $keyCol not in ${cols.mkString(",")}")
    val valCols = cols.filterNot(_ == keyCol)
    val updateSql =
      s"UPDATE $table SET ${valCols.map(c => s"$c = ?").mkString(", ")} WHERE $keyCol = ?"
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    val spark = df.sparkSession
    val updated = spark.sparkContext.longAccumulator("jdbc_upsert_updated")
    val inserted = spark.sparkContext.longAccumulator("jdbc_upsert_inserted")
    val keyIdx = cols.indexOf(keyCol)
    val valIdx = valCols.map(cols.indexOf)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        Class.forName(DriverClass)
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val up = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          // NULL needs setNull with the column's declared JDBC type —
          // setObject(i, null) is driver-undefined (Derby rejects it).
          val upTypes = (1 to cols.size).map(up.getParameterMetaData.getParameterType)
          val insTypes = (1 to cols.size).map(ins.getParameterMetaData.getParameterType)
          def set(ps: java.sql.PreparedStatement, types: Seq[Int],
              pos: Int, v: Any): Unit =
            if (v == null) ps.setNull(pos, types(pos - 1)) else ps.setObject(pos, v)
          rows.grouped(batchSize).foreach { batch =>
            batch.foreach { row =>
              valIdx.zipWithIndex.foreach { case (src, j) =>
                set(up, upTypes, j + 1, row.get(src))
              }
              set(up, upTypes, valCols.size + 1, row.get(keyIdx))
              if (up.executeUpdate() > 0) updated.add(1)
              else {
                cols.indices.foreach(j => set(ins, insTypes, j + 1, row.get(j)))
                try { ins.executeUpdate(); inserted.add(1) }
                catch {
                  // SQLState class 23 = integrity constraint violation:
                  // the key appeared between our UPDATE and INSERT. Last
                  // write wins — apply as an update.
                  case e: java.sql.SQLException
                      if String.valueOf(e.getSQLState).startsWith("23") =>
                    up.executeUpdate(); updated.add(1)
                }
              }
            }
            conn.commit() // one transaction per page, like execute_values
          }
          up.close(); ins.close()
        } finally conn.close()
      }
    }
    UpsertStats(updated.value, inserted.value)
  }

  /** Partitioned JDBC scan: `numPartitions` parallel range queries over
    * `[lower, upper]` of `splitCol` — the read side of the 100 TB story
    * (one cursor per split, not one global cursor). */
  def read(spark: SparkSession, url: String, table: String,
      splitCol: String, lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, splitCol, lower, upper, numPartitions, connectionProps)
}
