package graft.operators

import org.apache.spark.sql.SparkSession

/** Catalog metadata for a [[GraftTable]], persisted as a
  * `_graft_meta.json` sidecar in the table directory so a table is
  * addressable BY NAME (the reference's named-table registry intent,
  * `storage/azurestoragewrapper.py:40-52`): the DSv2 catalog
  * (`graft.sources.GraftCatalog`) reads it to reconstruct the table's
  * keys, partition column and index configuration without the caller
  * passing constructor arguments. Scala-API users who want their table
  * SQL-addressable call [[GraftTableMeta.annotate]] once.
  */
final case class GraftTableMeta(keys: Seq[String], partitionCol: String,
                                statsCols: Seq[String], bloomCols: Seq[String],
                                bloomBits: Int)

object GraftTableMeta {

  private def sidecar(path: String) =
    java.nio.file.Paths.get(path, "_graft_meta.json")

  private def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
  private def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")

  private def arr(xs: Seq[String]) =
    xs.map(x => "\"" + esc(x) + "\"").mkString("[", ",", "]")

  private def parseArr(body: String): Seq[String] =
    if (body.trim.isEmpty) Seq.empty
    else body.split("\",\\s*\"").toSeq
      .map(s => unesc(s.stripPrefix("\"").stripSuffix("\"")))

  /** Write (or replace) the sidecar atomically. */
  def write(path: String, m: GraftTableMeta): Unit = {
    val json = s"""{"keys":${arr(m.keys)},"partitionCol":"${esc(m.partitionCol)}",""" +
      s""""statsCols":${arr(m.statsCols)},"bloomCols":${arr(m.bloomCols)},""" +
      s""""bloomBits":${m.bloomBits}}"""
    val tmp = java.nio.file.Paths.get(path,
      s"._graft_meta_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.writeString(tmp, json)
    java.nio.file.Files.move(tmp, sidecar(path),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** The sidecar, if present. Field extraction by labelled scan of the
    * single-object JSON this module writes (same hand-rolled discipline
    * as the manifest format — no JSON library dependency).
    */
  def read(path: String): Option[GraftTableMeta] = {
    val p = sidecar(path)
    if (!java.nio.file.Files.exists(p)) return None
    val txt = java.nio.file.Files.readString(p)
    def field(name: String): String = {
      val at = txt.indexOf(s""""$name":""")
      require(at >= 0, s"bad _graft_meta.json: missing $name")
      txt.substring(at + name.length + 3)
    }
    def arrField(name: String): Seq[String] = {
      val rest = field(name)
      parseArr(rest.substring(rest.indexOf('[') + 1, rest.indexOf(']')))
    }
    def strField(name: String): String = {
      val rest = field(name).dropWhile(_ != '"').drop(1)
      unesc(rest.substring(0, rest.indexOf('"')))
    }
    def intField(name: String): Int =
      field(name).takeWhile(_.isDigit).toInt
    Some(GraftTableMeta(arrField("keys"), strField("partitionCol"),
      arrField("statsCols"), arrField("bloomCols"), intField("bloomBits")))
  }

  /** Record `t`'s configuration so the catalog can load it by name. */
  def annotate(t: GraftTable): GraftTable = {
    write(t.path, GraftTableMeta(t.keys, t.partitionCol, t.statsCols,
      t.bloomCols, t.bloomBits))
    t
  }

  /** Open a table directory through its sidecar (None if the directory
    * was never annotated).
    */
  def open(spark: SparkSession, path: String): Option[GraftTable] =
    read(path).map(m => new GraftTable(spark, path, m.keys, m.partitionCol,
      m.statsCols, m.bloomCols, m.bloomBits))
}
