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
                                bloomBits: Int,
                                partitionSrc: Seq[String] = Nil,
                                partitionXform: Seq[String] = Nil)

object GraftTableMeta {

  private def sidecar(path: String) =
    java.nio.file.Paths.get(path, "_graft_meta.json")

  private def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def arr(xs: Seq[String]) =
    xs.map(x => "\"" + esc(x) + "\"").mkString("[", ",", "]")

  /** Lex the flat single-object JSON this module writes into key →
    * raw-value pairs, honoring backslash escapes inside string
    * literals — so column names containing `]`, `",` or `"` (which
    * `write` escapes correctly) round-trip instead of silently
    * corrupting. Values are either a string literal, an array of
    * string literals, or an int.
    */
  private def lexObject(txt: String): Map[String, Either[String, Seq[String]]] = {
    var i = 0
    val n = txt.length
    def skipWs(): Unit = while (i < n && txt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      skipWs()
      require(i < n && txt(i) == c, s"bad _graft_meta.json: expected '$c' at $i")
      i += 1
    }
    // one string literal starting at txt(i) == '"'; returns the UNESCAPED value
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < n && txt(i) != '"') {
        if (txt(i) == '\\' && i + 1 < n) { sb.append(txt(i + 1)); i += 2 }
        else { sb.append(txt(i)); i += 1 }
      }
      require(i < n, "bad _graft_meta.json: unterminated string")
      i += 1 // closing quote
      sb.toString
    }
    val out = scala.collection.mutable.Map.empty[String, Either[String, Seq[String]]]
    expect('{')
    skipWs()
    while (i < n && txt(i) != '}') {
      val key = str()
      expect(':')
      skipWs()
      val value: Either[String, Seq[String]] =
        if (txt(i) == '[') {
          i += 1; skipWs()
          val items = scala.collection.mutable.ArrayBuffer.empty[String]
          while (i < n && txt(i) != ']') {
            items += str()
            skipWs()
            if (i < n && txt(i) == ',') { i += 1; skipWs() }
          }
          expect(']')
          Right(items.toSeq)
        } else if (txt(i) == '"') Left(str())
        else { // bare scalar (int)
          val start = i
          while (i < n && txt(i) != ',' && txt(i) != '}') i += 1
          Left(txt.substring(start, i).trim)
        }
      out(key) = value
      skipWs()
      if (i < n && txt(i) == ',') { i += 1; skipWs() }
    }
    out.toMap
  }

  /** Write (or replace) the sidecar atomically. */
  def write(path: String, m: GraftTableMeta): Unit = {
    val json = s"""{"keys":${arr(m.keys)},"partitionCol":"${esc(m.partitionCol)}",""" +
      s""""statsCols":${arr(m.statsCols)},"bloomCols":${arr(m.bloomCols)},""" +
      s""""bloomBits":${m.bloomBits},"partitionSrc":${arr(m.partitionSrc)},""" +
      s""""partitionXform":${arr(m.partitionXform)}}"""
    val tmp = java.nio.file.Paths.get(path,
      s"._graft_meta_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.writeString(tmp, json)
    java.nio.file.Files.move(tmp, sidecar(path),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** The sidecar, if present. Parsed by an escape-aware lexer over the
    * single-object JSON this module writes (no JSON library
    * dependency) — names containing quotes, brackets or `",` sequences
    * round-trip exactly as `write` escaped them.
    */
  def read(path: String): Option[GraftTableMeta] = {
    val p = sidecar(path)
    if (!java.nio.file.Files.exists(p)) return None
    val fields = lexObject(java.nio.file.Files.readString(p))
    def arrField(name: String): Seq[String] = fields.get(name) match {
      case Some(Right(xs)) => xs
      case other => sys.error(s"bad _graft_meta.json: $name = $other")
    }
    def strField(name: String): String = fields.get(name) match {
      case Some(Left(s)) => s
      case other => sys.error(s"bad _graft_meta.json: $name = $other")
    }
    def intField(name: String): Int = strField(name).toInt
    // absent in pre-synthetic-partitioning sidecars → Nil
    val partitionSrc = fields.get("partitionSrc") match {
      case Some(Right(xs)) => xs
      case _ => Seq.empty[String]
    }
    // absent in pre-transform sidecars -> all-identity
    val partitionXform = fields.get("partitionXform") match {
      case Some(Right(xs)) => xs
      case _ => Seq.empty[String]
    }
    Some(GraftTableMeta(arrField("keys"), strField("partitionCol"),
      arrField("statsCols"), arrField("bloomCols"), intField("bloomBits"),
      partitionSrc, partitionXform))
  }

  /** Record `t`'s configuration so the catalog can load it by name. */
  def annotate(t: GraftTable): GraftTable = {
    write(t.path, GraftTableMeta(t.keys, t.partitionCol, t.statsCols,
      t.bloomCols, t.bloomBits, t.partitionSrc, t.partitionXform))
    t
  }

  /** Follow a GENERATION POINTER (`_graft_ptr`, written by the SQL
    * catalog's atomic CREATE OR REPLACE): the file names the
    * subdirectory holding the table's CURRENT generation. Directories
    * without one (the common in-place layout) resolve to themselves.
    */
  def resolve(path: String): String = {
    val p = java.nio.file.Paths.get(path, "_graft_ptr")
    if (java.nio.file.Files.isRegularFile(p))
      s"$path/${java.nio.file.Files.readString(p).trim}"
    else path
  }

  /** Open a table directory through its sidecar (None if the directory
    * was never annotated), following a generation pointer if present.
    */
  def open(spark: SparkSession, path: String): Option[GraftTable] = {
    val dir = resolve(path)
    read(dir).map(m => new GraftTable(spark, dir, m.keys, m.partitionCol,
      m.statsCols, m.bloomCols, m.bloomBits, m.partitionSrc,
      m.partitionXform))
  }
}
