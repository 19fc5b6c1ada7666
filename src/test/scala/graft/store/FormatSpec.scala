package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X192 reader-feature gate — the Delta protocol/table-features shape:
  * a manifest names what a reader MUST understand; an incomprehensible
  * commit record refuses loudly instead of degrading to a listing read
  * that would return confidently wrong rows.
  */
class FormatSpec extends SparkSpec {
  import spark.implicits._

  private def manifestNode(root: String, v: Long) = {
    val p = org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
      new org.apache.hadoop.fs.Path(s"$root/_manifest-v$v"))
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p.toString)), "UTF-8"))
  }

  test("dv manifests declare the deletion-vectors reader feature; plain ones declare none") {
    val root = java.nio.file.Files.createTempDirectory("graft_fmt1").toString + "/t"
    Warehouse.writeSnapshot(spark.range(0, 100).toDF("id"), root)
    assert(manifestNode(root, 1L).get("readerFeatures") === null)
    Warehouse.deleteWhereDv(spark, root, col("id") === 5L)
    val feats = manifestNode(root, 2L).get("readerFeatures")
    assert(feats != null)
    assert(feats.size() === 1)
    assert(feats.get(0).asText() === "deletion-vectors")
    // materializing the deletes drops the requirement again
    Warehouse.materializeDeletes(spark, root)
    assert(manifestNode(root, 3L).get("readerFeatures") === null)
  }

  test("an unknown reader feature refuses the read — never the silent listing fallback") {
    val root = java.nio.file.Files.createTempDirectory("graft_fmt2").toString + "/t"
    Warehouse.writeSnapshot(spark.range(0, 100).toDF("id"), root)
    // forge a future-format manifest: same content + a feature this
    // build has never heard of
    val p = java.nio.file.Paths.get(org.apache.hadoop.fs.Path
      .getPathWithoutSchemeAndAuthority(
        new org.apache.hadoop.fs.Path(s"$root/_manifest-v1")).toString)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(java.nio.file.Files.readAllBytes(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.putArray("readerFeatures").add("quantum-row-teleportation")
    java.nio.file.Files.write(p, mapper.writeValueAsBytes(node))
    // drop the local-FS checksum sidecar, or the stale crc turns the
    // forged manifest into an unreadable-manifest IOException (the
    // legitimate degrade path) instead of a parsed future-format one
    java.nio.file.Files.deleteIfExists(
      p.resolveSibling("." + p.getFileName.toString + ".crc"))
    val e = intercept[IllegalStateException] {
      Warehouse.readSnapshot(spark, root).count()
    }
    assert(e.getMessage.contains("quantum-row-teleportation"))
    // the same gate guards every manifest consumer, not just reads
    intercept[IllegalStateException] {
      Warehouse.deleteWhere(spark, root, col("id") === 1L)
    }
  }
}
