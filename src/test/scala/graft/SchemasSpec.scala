package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Schemas

class SchemasSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("validated read accepts matching schemas") {
    val df = Schemas.validated(
      spark,
      "/root/testdata/sf0.001/documents.parquet",
      Schemas.documents
    )
    assert(df.count() > 0)
    val emb = Schemas.validated(
      spark,
      "/root/testdata/sf0.001/embeddings.parquet",
      Schemas.embeddings
    )
    assert(emb.count() > 0)
  }

  test("validated read fails fast with a readable diff on mismatch") {
    val err = intercept[IllegalArgumentException] {
      Schemas.validated(
        spark,
        "/root/testdata/sf0.001/documents.parquet",
        Schemas.embeddings
      )
    }
    assert(err.getMessage.contains("missing column vec_id"))
  }
}
