package graft.stages

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Canonicalization (J7): duplicate-entity resolution via iterative-join
  * connected components — pure DataFrame label propagation to the
  * component minimum (deterministic canonical id), no RDD/GraphX.
  *
  * Each iteration is one shuffle (groupBy vertex); lineage is truncated
  * with localCheckpoint every iteration so the plan does not grow across
  * the loop (SURVEY.md §7.4 risk 4). Converges in O(component diameter)
  * iterations; name-variant clusters are tiny, so the loop is short, and
  * the maxIter bound backstops pathological inputs.
  */
object Canonicalize {

  /** @param edges (src, dst) undirected string edges
    * @return (id, canonicalId) for every vertex appearing in edges
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession

    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count() // materialize once; reused every iteration

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor labels: edge (src,dst) proposes label(src) to dst
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      val next = msgs.union(labels.select(col("id"), col("label")))
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels.select(col("id"), col("label").as("canonicalId"))
  }
}
