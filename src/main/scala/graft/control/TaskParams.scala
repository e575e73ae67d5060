package graft.control

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.SessionFilter

/** S8 — the reference's control plane: a `task` row holding a JSON
  * blob of query parameters, read driver-side over plain JDBC
  * (dao/impl/TaskDAOImpl.java:24), decoded with the quirk that EVERY
  * value is wrapped in a one-element JSON array
  * (util/ParamUtils.java:44-50), e.g.
  * `{"startDate":["2020-01-01"],"professionals":["p1,p2"]}`.
  *
  * Not a Spark dataflow concern: one row, driver-side, feeding the
  * filter builders. We decode with Spark's JSON expression machinery
  * (from_json on a literal) so no JSON library dependency is added.
  */
final case class TaskParams(raw: Map[String, Seq[String]]) {
  def first(key: String): Option[String] = raw.get(key).flatMap(_.headOption)
  def list(key: String): Option[Seq[String]] =
    first(key).map(_.split(",").toSeq.filter(_.nonEmpty))
  def double(key: String): Option[Double] = first(key).map(_.toDouble)

  /** Map the reference's task_param keys onto our session filter. */
  def toSessionFilter: SessionFilter.Params = SessionFilter.Params(
    minAcctbal = double("minAcctbal"),
    maxAcctbal = double("maxAcctbal"),
    segments = list("segments"),
    nations = list("nations").map(_.map(_.toInt)),
    eventTypes = list("eventTypes"))
}

object TaskParams {

  /** Decode a task_param JSON blob (ParamUtils semantics: values are
    * 1-element arrays; we also accept bare strings). */
  def fromJson(spark: SparkSession, json: String): TaskParams = {
    import org.apache.spark.sql.types._
    val schema = MapType(StringType, ArrayType(StringType))
    val row = spark.range(1)
      .select(from_json(lit(json), schema).as("m"))
      .head()
    val m = Option(row.getMap[String, scala.collection.Seq[String]](0))
      .map(_.toMap.map { case (k, v) => k -> v.toSeq })
      .getOrElse(Map.empty[String, Seq[String]])
    TaskParams(m)
  }

  /** Driver-side JDBC control read: `SELECT task_param FROM task WHERE
    * task_id = ?` — the reference's TaskDAO, minus the DAO layer. */
  def fromJdbc(spark: SparkSession, url: String, taskId: Long,
      table: String = "task"): TaskParams = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.prepareStatement(
        s"SELECT task_param FROM $table WHERE task_id = ?")
      try {
        st.setLong(1, taskId)
        val rs = st.executeQuery()
        require(rs.next(), s"no task row for task_id=$taskId")
        fromJson(spark, rs.getString(1))
      } finally st.close()
    } finally conn.close()
  }
}
