package graft.core

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Model persistence (SURVEY §2.9's MLWriter-style sinks): every graft
  * model is small immutable learned state (vectors of per-column
  * statistics, coefficient arrays, category lists) and Serializable, so
  * persistence is one driver-side object stream to any Hadoop-compatible
  * filesystem (local, HDFS, S3A...) — functional parity with the
  * reference's pickle-based persistence of fitted estimators.
  *
  * Scale note: model state is O(features)/O(categories), never O(rows);
  * the write is a single small file, no Spark job.
  */
object ModelIO {

  def save(spark: SparkSession, model: AnyRef, path: String): Unit = {
    require(model.isInstanceOf[java.io.Serializable],
      s"${model.getClass.getName} is not Serializable")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new ObjectOutputStream(fs.create(p, true))
    try out.writeObject(model) finally out.close()
  }

  def load[T](spark: SparkSession, path: String): T = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new ObjectInputStream(fs.open(p))
    try in.readObject().asInstanceOf[T] finally in.close()
  }
}
