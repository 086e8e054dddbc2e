package graft.queries

import java.nio.file.{Files, Path, Paths}

import graft.SparkSpec

/** The PQ index lifecycle (build artifacts → serve from artifacts): the
  * stored-index search must reproduce the oracle-gated in-query q119
  * row-for-row, and the codes artifact must actually deliver the
  * compression ADC serving exists for.
  */
class PqIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def dirBytes(p: Path): Long = {
    val s = java.nio.file.Files.walk(p)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  test("searching the stored index reproduces q119 exactly") {
    val idx = Files.createTempDirectory("pq-index").toString
    graft.core.CacheScope.scoped {
      CorpusOps.writePqIndex(spark, sf, idx)
    }
    val fromIndex = graft.core.CacheScope.scoped {
      CorpusOps.pqAdcTopKFromIndex(spark, idx, sf).collect()
    }.map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val inQuery = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q119_pq_adc_topk")(spark, sf).collect()
    }.map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(fromIndex === inQuery,
      "stored-index ADC must equal the in-query oracle-gated form")
    assert(fromIndex.nonEmpty)
  }

  test("the codes artifact is a fraction of the embeddings it replaces") {
    val idx = Files.createTempDirectory("pq-index-size").toString
    graft.core.CacheScope.scoped {
      CorpusOps.writePqIndex(spark, sf, idx)
    }
    val codesBytes = dirBytes(Paths.get(idx, "codes.parquet"))
    val embBytes = dirBytes(Paths.get(sf, "embeddings.parquet"))
    // raw: 4 longs (~16 B, and the code domain is tiny so parquet
    // dictionary-encodes far below that) vs 64 floats (256 B); even
    // with parquet overheads the artifact must be well under a third
    assert(codesBytes * 3 < embBytes,
      s"codes $codesBytes B vs embeddings $embBytes B — compression lost")
  }
}
