package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.state._

/** Property-based exactly-once contracts: for ANY sequence of batches with
  * arbitrary replays, OpaqueMap must behave as if each txid's LAST attempt
  * ran exactly once, and TransactionalMap as if each txid ran exactly once
  * (replays carry identical data). These generalize the fixed traces of
  * `state_test.clj:58-98`. */
object StatePropertySpec extends Properties("ExactlyOnceState") {

  // one logical batch: the partial count its final attempt contributes, plus
  // up to two DIFFERING failed attempts before it (opaque replay pattern)
  private case class Batch(finalPartial: Long, failedAttempts: List[Long])

  private val batchGen: Gen[Batch] = for {
    fin <- Gen.choose(0L, 20L)
    nFails <- Gen.choose(0, 2)
    fails <- Gen.listOfN(nFails, Gen.choose(0L, 20L))
  } yield Batch(fin, fails)

  private def count(partial: Long) = CombinerValueUpdater[Long](partial, _ + _)

  property("OpaqueMap: last attempt per txid wins for any replay pattern") =
    Prop.forAll(Gen.listOfN(8, batchGen)) { batches =>
      val id = s"prop-${java.util.UUID.randomUUID()}"
      val m = new OpaqueMap[Long](new MemoryBackingMap[OpaqueValue[Long]](id))
      val k = Seq(Seq[Any]("key"))
      batches.zipWithIndex.foreach { case (b, txid) =>
        // failed attempts: beginCommit + update, commit never lands, the
        // SAME txid is retried — possibly with different data
        b.failedAttempts.foreach { partial =>
          m.beginCommit(Some(txid.toLong))
          m.multiUpdate(k, Seq(count(partial)))
        }
        m.beginCommit(Some(txid.toLong))
        m.multiUpdate(k, Seq(count(b.finalPartial)))
        m.commit(Some(txid.toLong))
      }
      val expected = batches.map(_.finalPartial).sum
      val got = m.multiGet(k)
      MemoryBackingMap.clear(id)
      Prop(got == Seq(Some(expected))) :| s"got $got expected $expected"
    }

  property("TransactionalMap: identical-data replays are idempotent") =
    Prop.forAll(Gen.listOfN(8, Gen.zip(Gen.choose(0L, 20L), Gen.choose(1, 3)))) { spec =>
      val id = s"prop-${java.util.UUID.randomUUID()}"
      val m = new TransactionalMap[Long](new MemoryBackingMap[TransactionalValue[Long]](id))
      val k = Seq(Seq[Any]("key"))
      spec.zipWithIndex.foreach { case ((partial, attempts), txid) =>
        (1 to attempts).foreach { _ =>
          m.beginCommit(Some(txid.toLong))
          m.multiUpdate(k, Seq(count(partial))) // same data each attempt
          m.commit(Some(txid.toLong))
        }
      }
      val expected = spec.map(_._1).sum
      val got = m.multiGet(k)
      MemoryBackingMap.clear(id)
      Prop(got == Seq(Some(expected))) :| s"got $got expected $expected"
    }

  // shared tiny session for the durable-map property (no Spark jobs run at
  // compactAfter = MaxValue — open() only needs the session for snapshots)
  private lazy val propSpark = org.apache.spark.sql.SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private case class Op(key: String, partial: Long, failedFirst: Boolean,
                        restartBefore: Boolean)

  private val opGen: Gen[Op] = for {
    k <- Gen.oneOf("a", "b", "c")
    p <- Gen.choose(0L, 9L)
    f <- Gen.oneOf(true, false)
    r <- Gen.frequency(3 -> false, 1 -> true)
  } yield Op(k, p, f, r)

  property("ParquetBackingMap ≡ MemoryBackingMap for any batch/replay/restart sequence") =
    Prop.forAll(Gen.listOfN(10, opGen)) { ops =>
      val memId = s"pbmprop-${java.util.UUID.randomUUID()}"
      val dir = java.nio.file.Files.createTempDirectory("pbmprop").toString
      val mem = new OpaqueMap[Long](new MemoryBackingMap[OpaqueValue[Long]](memId))
      def openDurable() = new OpaqueMap[Long](ParquetBackingMap.open[OpaqueValue[Long]](
        propSpark, dir, ParquetBackingMap.opaqueCodec, compactAfter = Int.MaxValue))
      var durable = openDurable()
      ops.zipWithIndex.foreach { case (op, txid) =>
        if (op.restartBefore) { // process dies between batches, WAL replays
          ParquetBackingMap.close(dir)
          durable = openDurable()
        }
        val k = Seq(Seq[Any](op.key))
        for (m <- Seq(mem, durable)) {
          if (op.failedFirst) { // a differing failed attempt, then the real one
            m.beginCommit(Some(txid.toLong))
            m.multiUpdate(k, Seq(count(op.partial + 100)))
          }
          m.beginCommit(Some(txid.toLong))
          m.multiUpdate(k, Seq(count(op.partial)))
          m.commit(Some(txid.toLong))
        }
      }
      val keys = Seq("a", "b", "c").map(x => Seq[Any](x))
      val got = durable.multiGet(keys)
      val want = mem.multiGet(keys)
      MemoryBackingMap.clear(memId)
      ParquetBackingMap.close(dir)
      Prop(got == want) :| s"durable $got vs memory $want"
    }

  property("IncrementalClusters.foldEdges: arbitrary batched edge streams == reference union-find; touched components re-emit fully; replay is a state no-op") =
    Prop.forAll(Gen.listOfN(5, Gen.listOf(
        Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L))))) { batches =>
      val id = s"prop-inc-${java.util.UUID.randomUUID()}"
      val parents = new NonTransactionalMap(new MemoryBackingMap[Long](s"$id-p"))
      val membersM = new NonTransactionalMap(
        new MemoryBackingMap[Vector[Long]](s"$id-m"))
      val inc = new graft.streaming.IncrementalClusters(parents, membersM)
      // reference: min-label components over ALL edges seen so far
      def refComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
        val p = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val q = p.getOrElse(x, x)
          if (q == x) x else { val r = find(q); p(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          p.getOrElseUpdate(a, a); p.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) p(math.max(ra, rb)) = math.min(ra, rb)
        }
        p.keys.map(n => n -> find(n)).toMap
      }
      var seen = Vector.empty[(Long, Long)]
      val ok = batches.zipWithIndex.forall { case (es0, txid) =>
        val es = es0.filter(e => e._1 != e._2).distinct
        parents.beginCommit(Some(txid.toLong))
        membersM.beginCommit(Some(txid.toLong))
        val emitted = inc.foldEdges(es.toArray, parents, membersM).toSet
        parents.commit(Some(txid.toLong)); membersM.commit(Some(txid.toLong))
        seen = seen ++ es
        val ref = refComponents(seen)
        // (1) every stored parent is the reference's min label, fully
        //     compressed (no chains)
        val storedOk = parents.scanAll().forall { case (k, v) =>
          ref(k.head.asInstanceOf[Long]) == v.asInstanceOf[Long]
        } && parents.scanAll().size == ref.size
        // (2) members(live root) == the component's full sorted membership;
        //     losing roots hold empty tombstones
        val liveRoots = ref.values.toSet
        val membersOk = membersM.scanAll().forall { case (k, v) =>
          val r = k.head.asInstanceOf[Long]
          val lst = v.asInstanceOf[Vector[Long]]
          if (liveRoots(r)) lst == ref.filter(_._2 == r).keys.toVector.sorted
          else lst.isEmpty
        }
        // (3) this batch re-emits EXACTLY the full membership of every
        //     component touched by one of its endpoints
        val touched = es.flatMap(e => Seq(e._1, e._2)).map(ref).toSet
        val expectEmit = ref.collect {
          case (n, r) if touched(r) => (n, r) }.toSet
        val emitOk = emitted == expectEmit
        // (4) replaying the same batch leaves state identical and re-emits
        //     the same (current) labels
        val before = (parents.scanAll().toSet, membersM.scanAll().toSet)
        parents.beginCommit(Some(txid.toLong))
        membersM.beginCommit(Some(txid.toLong))
        val replay = inc.foldEdges(es.toArray, parents, membersM).toSet
        parents.commit(Some(txid.toLong)); membersM.commit(Some(txid.toLong))
        val replayOk = replay == emitted &&
          (parents.scanAll().toSet, membersM.scanAll().toSet) == before
        storedOk && membersOk && emitOk && replayOk
      }
      MemoryBackingMap.clear(s"$id-p"); MemoryBackingMap.clear(s"$id-m")
      Prop(ok)
    }

  property("OpaqueValue.update/get round-trips for monotone txids") =
    Prop.forAll(Gen.listOfN(6, Gen.choose(0L, 5L))) { deltas =>
      // txids strictly increasing via cumulative sums (+1)
      val txids = deltas.scanLeft(0L)((a, d) => a + d + 1).tail
      var v = OpaqueValue.first(Some(txids.head), "v0")
      val ok = txids.tail.zipWithIndex.forall { case (tx, i) =>
        val prevCurr = v.curr
        v = v.update(Some(tx), s"v${i + 1}")
        v.prev.contains(prevCurr) && v.curr == s"v${i + 1}" &&
          v.get(Some(tx)).contains(prevCurr) && // same-tx read sees pre-batch
          v.get(Some(tx + 1)).contains(v.curr)  // later tx sees committed
      }
      Prop(ok)
    }
}
