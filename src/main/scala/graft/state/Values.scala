package graft.state

/** Exactly-once value wrappers — ports of the reference's state-value
  * semantics (see SURVEY.md §2.2, §7.4; semantics oracle:
  * `storm-core/test/clj/storm/trident/state_test.clj:33-98`).
  *
  * The txid here is the Structured Streaming `batchId` (strictly increasing
  * per query, replayed with the SAME id on failure recovery — the same
  * contract as the reference's `TransactionAttempt` txid).
  */

/** `storm/trident/state/TransactionalValue.java:23` — value + the txid that
  * produced it. Used when a batch's contents are IDENTICAL on replay: if the
  * stored txid equals the current txid the update is skipped. */
final case class TransactionalValue[T](txid: Long, value: T)

/** `storm/trident/state/OpaqueValue.java:22,37-57` — value + previous value
  * + txid. Handles sources whose replayed batch may DIFFER from the original
  * (opaque spouts): on a same-txid replay the update is re-applied against
  * `prev`, rolling back the half-applied `curr`.
  */
final case class OpaqueValue[T](currTxid: Long, curr: T, prev: Option[T]) {

  /** `OpaqueValue.get(batchTxid)` — the value as of the start of `batchTxid`:
    * a replay of the current txid must see the PRE-batch value. */
  def get(batchTxid: Option[Long]): Option[T] = batchTxid match {
    case None => Some(curr)
    case Some(tx) if currTxid < tx => Some(curr)
    case Some(tx) if currTxid == tx => prev
    case Some(tx) => throw new IllegalStateException(
      s"Current batch ($tx) is behind state's batch: $this")
  }

  /** `OpaqueValue.update(batchTxid, value)` — new txid: shift curr→prev;
    * same txid (replay): keep prev, overwrite curr. */
  def update(batchTxid: Option[Long], value: T): OpaqueValue[T] = {
    val newPrev = batchTxid match {
      case None => Some(curr)
      case Some(tx) if currTxid < tx => Some(curr)
      case Some(tx) if currTxid == tx => prev
      case Some(tx) => throw new IllegalStateException(
        s"Current batch ($tx) is behind state's batch: $this")
    }
    OpaqueValue(batchTxid.getOrElse(currTxid), value, newPrev)
  }
}

object OpaqueValue {
  /** First write of a key at `txid`: no previous committed value. */
  def first[T](txid: Option[Long], value: T): OpaqueValue[T] =
    OpaqueValue(txid.getOrElse(0L), value, None)
}

/** `storm/trident/state/ValueUpdater.java` — how a batch's partial result is
  * folded into the stored value. */
trait ValueUpdater[T] extends Serializable {
  def update(stored: Option[T]): T
}

/** `operation/impl/CombinerValueUpdater.java` — combine the stored value
  * with a batch-local partial using a CombinerAggregator-style combine. */
final case class CombinerValueUpdater[T](partial: T, combine: (T, T) => T)
  extends ValueUpdater[T] {
  def update(stored: Option[T]): T = stored match {
    case Some(s) => combine(s, partial)
    case None => partial
  }
}
