package graft.api

/** Ordered, duplicate-free list of field names — the reference's schema notion.
  *
  * Mirrors `storm-core/src/jvm/backtype/storm/tuple/Fields.java:28-88`
  * (ordered names + name→position index, duplicate rejection, `select`,
  * `fieldIndex`, `contains`). Types are NOT part of the declaration there
  * (tuples are dynamically typed, `Tuple.java:24-27`); on Spark the engine
  * derives the typed `StructType` from the underlying plan, so `Fields`
  * stays a pure name-level surface.
  */
final case class Fields(names: Seq[String]) extends Serializable {
  private val dups = names.diff(names.distinct)
  require(dups.isEmpty, s"duplicate fields: ${dups.mkString(", ")}")
  private lazy val index: Map[String, Int] = names.zipWithIndex.toMap

  def size: Int = names.size
  def contains(name: String): Boolean = index.contains(name)

  /** Position of a field — `Fields.fieldIndex`, Fields.java:75-81. */
  def fieldIndex(name: String): Int =
    index.getOrElse(name, throw new IllegalArgumentException(
      s"$name does not exist in $this"))

  /** Projection of another tuple's values — `Fields.select`, Fields.java:48-54. */
  def select(subset: Fields, values: Seq[Any]): Seq[Any] =
    subset.names.map(n => values(fieldIndex(n)))

  /** Concatenation — `TridentUtils.fieldsConcat` (each() appends fields). */
  def ++(other: Fields): Fields = Fields(names ++ other.names)

  override def toString: String = names.mkString("[", ", ", "]")
}

object Fields {
  def apply(names: String*)(implicit d: DummyImplicit): Fields = Fields(names.toSeq)
}
