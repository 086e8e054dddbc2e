package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-stage retrieval composition (L95 → L96): candidate
  * containment in the registered BM25 list, exact Scala replay of the
  * candidate maxsim scores, and rerank ordering.
  */
class RerankPipelineSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("rerank stays inside the first stage, scores replay, order holds") {
    val out = graft.core.CacheScope.scoped {
      RetrievalOps.rerankPipeline(spark, dir)
        .as[(Long, Long, Long, Long, Long)].collect()
    }
    assert(out.nonEmpty)

    // 1. containment: every reranked doc is a first-stage candidate at
    //    the provenance rank the output claims
    val bm = graft.core.CacheScope.scoped {
      RetrievalOps.bm25Scored(spark, dir)
        .withColumn("rs", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
            .orderBy(col("score").desc, col("doc_id"))))
        .as[(Long, Long, Long, Long)].collect()  // qid, doc_id, score, rs
    }
    val bmRank = bm.map(r => (r._1, r._2) -> r._4.toLong).toMap
    out.foreach { case (qid, _, docId, _, rs) =>
      assert(bmRank.get((qid, docId)).contains(rs),
        s"doc $docId of qid $qid must be a first-stage candidate at rank $rs")
      assert(rs <= 20L)
    }

    // 2. exact maxsim replay over the embedding fixture
    val emb = graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def maxsim(q: Array[Float], dv: Array[Float]): Long =
      (0 until 8).map { i =>
        math.floor((0 until 8).map { j =>
          (0 until 8).map(k =>
            q(i * 8 + k).toDouble * dv(j * 8 + k).toDouble).sum
        }.max * 1e6).toLong
      }.sum
    out.foreach { case (qid, _, docId, scoreU, _) =>
      val expect = maxsim(emb(qid * 50), emb(docId))
      assert(scoreU === expect, s"maxsim replay of (qid $qid, doc $docId)")
    }

    // 3. ordering within each qid: (score desc, doc_id asc)
    out.groupBy(_._1).foreach { case (qid, rs) =>
      val ordered = rs.sortBy(_._2).map(r => (-r._4, r._3)).toSeq
      assert(ordered === ordered.sorted, s"qid $qid rerank order")
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length.toLong),
        s"qid $qid ranks dense from 1")
    }
  }
}
