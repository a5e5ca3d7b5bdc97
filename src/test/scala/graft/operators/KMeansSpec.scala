package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lloyd's k-means ([[KMeans.fit]]) — determinism, assignment
  * semantics, empty-cluster survival, and the zero-shuffle-assignment
  * plan contract. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Double] = xs.toArray

  test("assigns every vector, ids are seed ids, deterministic across runs") {
    val ev = spark.range(0, 200).as[Long]
      .map { i =>
        // three planted directions + id-dependent jitter
        val base = (i % 3).toInt
        val v = new Array[Double](4)
        v(base) = 1.0
        v((base + 1) % 4) = 0.01 * (i % 7)
        (i, v)
      }
    val a1 = KMeans.fit(ev, k = 4, iters = 2)
    val a2 = KMeans.fit(ev, k = 4, iters = 2)
    assert(a1.count() === 200)
    val ids = a1.select($"cluster_id").distinct().as[Long].collect().toSet
    assert(ids.subsetOf(Set(0L, 1L, 2L, 3L)))
    assert(a1.orderBy($"vec_id").collect().toSeq ===
      a2.orderBy($"vec_id").collect().toSeq)
  }

  test("converges to the planted clusters on separable data") {
    // 3 tight planted clusters; seeds 0,1,2 land one per cluster
    val ev = spark.range(0, 90).as[Long].map { i =>
      val base = (i % 3).toInt
      val v = new Array[Double](4)
      v(base) = 1.0
      v(3) = 1e-4 * ((i * 31 % 11) - 5) // tiny symmetric jitter
      (i, v)
    }
    val asg = KMeans.fit(ev, k = 3, iters = 3)
      .select($"vec_id", $"cluster_id").as[(Long, Long)].collect()
    // every member of a planted cluster maps to the same centroid id,
    // and distinct planted clusters map to distinct centroids
    val byPlanted = asg.groupBy { case (id, _) => id % 3 }
      .map { case (p, rows) => p -> rows.map(_._2).toSet }
    assert(byPlanted.values.forall(_.size == 1))
    assert(byPlanted.values.flatten.toSet.size === 3)
  }

  test("a centroid that loses all members drops out; its id never reappears") {
    // seed 0 is a far outlier direction with NO other members: after
    // one iteration its centroid is exactly its seed vector (mean of
    // one), then every other vector still prefers centroids 1/2
    val rows = (0L, vec(0, 0, 0, 1)) +:
      (1L to 40L).map(i =>
        (i, if (i % 2 == 0) vec(1, 0.001 * i, 0, 0) else vec(0, 1, 0.001 * i, 0)))
    val ev = rows.toDS()
    val asg = KMeans.fit(ev, k = 3, iters = 2)
    val sizes = asg.groupBy($"cluster_id").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes(0L) === 1) // only the outlier itself
    assert(sizes.values.sum === 41)
  }

  test("assignment matches the relational rank-1 formulation (oracle contract)") {
    val ev = spark.range(0, 60).as[Long].map { i =>
      val v = new Array[Double](3)
      v((i % 3).toInt) = 1.0 + 0.001 * (i % 5)
      v(((i % 3).toInt + 1) % 3) = 0.3
      (i, v)
    }
    val asg = KMeans.fit(ev, k = 3, iters = 0) // pure seed assignment
    // relational replica: crossJoin + rank by (cosine6 desc, cid asc)
    val e = ev.toDF("vec_id", "v")
    val c = ev.filter(_._1 < 3).toDF("cid", "cv")
    val sim = graft.queries.VectorQueries.cosine6($"v", $"cv")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy(sim.desc, $"cid".asc)
    val expected = e.crossJoin(c)
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"vec_id", $"cid")
      .as[(Long, Long)].collect().toMap
    val got = asg.select($"vec_id", $"cluster_id")
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("fit plan has no crossJoin/cartesian: assignment is map-side") {
    val ev = spark.range(0, 50).as[Long].map { i =>
      val v = new Array[Double](3); v((i % 3).toInt) = 1.0; (i, v)
    }
    val plan = KMeans.fit(ev, k = 3, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
