package graft.util

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Shared filesystem helpers — one spelling of recursive delete instead of
  * one per call site ([[graft.state.ParquetBackingMap]] snapshot pruning,
  * [[graft.sources.TransactionalParquetSink]] vacuum, Verify's bad-dump
  * removal). */
object Fs {
  /** Depth-first delete; tolerates concurrent removal (deleteIfExists). */
  def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }
}
