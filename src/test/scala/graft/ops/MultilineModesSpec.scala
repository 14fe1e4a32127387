package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Start/Continue/End multiline mode parity, with line fixtures lifted
  * from the reference's own unit tests
  * (`core/unittest/processor/ProcessorSplitMultilineLogStringNative-
  * Unittest.cpp:24-32`: LOG_BEGIN/CONTINUE/END_STRING + regexes) and
  * expectations derived from the processor state machine
  * (`ProcessorSplitMultilineLogStringNative.cpp:130-295`).
  */
class MultilineModesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // the reference's fixture vocabulary
  private val B = "Exception in thread 'main' java.lang.NullPointerException"
  private val C = "    at com.example.myproject.Book.getTitle(Book.java:16)"
  private val E = "    ...23 more"
  private val U = "unmatch log"
  private val sRx = "Exception.*"
  private val cRx = "\\s+at\\s.*"
  private val eRx = "\\s*\\.\\.\\.\\d+ more"

  private def run(lines: Seq[String], m: AggOps.MultilineMerge) = {
    val s = spark; import s.implicits._
    val df = lines.zipWithIndex.map { case (t, i) => ("c1", i, t) }
      .toDF("conv_id", "turn_idx", "text")
    m(df).collect().map(r => (
      r.getAs[Long]("segment"),
      r.getAs[Number]("first_turn").longValue(),
      r.getAs[Long]("n_lines"),
      r.getAs[String]("merged_text"))).sortBy(_._2).toSeq
  }

  private def texts(out: Seq[(Long, Long, Long, String)]): Seq[String] =
    out.map(_._4)

  test("start+continue: continue-run attaches, closing line and orphan continues unmatch") {
    val out = run(Seq(U, B, C, C, U, C, B, C),
      AggOps.MultilineMerge(startPattern = Some(sRx), continuePattern = Some(cRx)))
    // U0 unmatched; [B1,C2,C3]; U4 closes+unmatches; C5 orphan unmatched;
    // [B6,C7] open at EOF -> matched (no end pattern)
    assert(texts(out) == Seq(U, s"$B\n$C\n$C", U, C, s"$B\n$C"))
    assert(out.map(_._3) == Seq(1L, 3L, 1L, 1L, 2L))
    // discard mode keeps only the two real records
    val disc = run(Seq(U, B, C, C, U, C, B, C),
      AggOps.MultilineMerge(startPattern = Some(sRx), continuePattern = Some(cRx),
        discardUnmatched = true))
    assert(texts(disc) == Seq(s"$B\n$C\n$C", s"$B\n$C"))
  }

  test("start+end: record runs through the END line inclusive; EOF partial unmatches per line") {
    val out = run(Seq(U, B, U, C, E, U, B, C),
      AggOps.MultilineMerge(startPattern = Some(sRx), endPattern = Some(eRx)))
    // U0 unmatched; [B1..E4] one record (anything accumulates between
    // start and end); U5 unmatched; B6,C7 partial at EOF -> single lines
    assert(texts(out) == Seq(U, s"$B\n$U\n$C\n$E", U, B, C))
    assert(out.filter(_._1 > 0).map(_._3) == Seq(4L))
  }

  test("continue+end: continue opens, end closes inclusive; lone end is its own record") {
    val out = run(Seq(C, C, E, U, E, C, U, C, C),
      AggOps.MultilineMerge(continuePattern = Some(cRx), endPattern = Some(eRx)))
    // [C0,C1,E2]; U3 unmatched; E4 alone is a record; [C5,U6] fails the
    // open chunk (U6 is neither continue nor end); [C7,C8] EOF partial
    assert(texts(out) == Seq(s"$C\n$C\n$E", U, E, C, U, C, C))
    assert(out.filter(_._1 > 0).map(_._4) == Seq(s"$C\n$C\n$E", E))
  }

  test("end-only: always accumulating, end line closes inclusive, tail unmatches") {
    val out = run(Seq(U, C, E, B, E, U),
      AggOps.MultilineMerge(endPattern = Some(eRx)))
    assert(texts(out) == Seq(s"$U\n$C\n$E", s"$B\n$E", U))
    assert(out.map(_._1).count(_ > 0) == 2)
    val disc = run(Seq(U, C, E, B, E, U),
      AggOps.MultilineMerge(endPattern = Some(eRx), discardUnmatched = true))
    assert(texts(disc) == Seq(s"$U\n$C\n$E", s"$B\n$E"))
  }

  test("normalization: start+continue+end drops continue; lone continue disables multiline") {
    // with continue dropped, behaves exactly like start+end
    val all3 = run(Seq(U, B, U, E),
      AggOps.MultilineMerge(Some(sRx), Some(cRx), Some(eRx)))
    val se = run(Seq(U, B, U, E),
      AggOps.MultilineMerge(startPattern = Some(sRx), endPattern = Some(eRx)))
    assert(all3 == se)
    // lone continue: every line passes through as its own record
    val lone = run(Seq(C, C, U),
      AggOps.MultilineMerge(continuePattern = Some(cRx)))
    assert(texts(lone) == Seq(C, C, U))
    assert(lone.forall(_._1 > 0))
  }

  test("fsm stepper: flush preserves the segment counter; disabled mode passes through") {
    val f = AggOps.MultilineFsm(Some(sRx), None, None, discardUnmatched = false)
    val (r1, st1) = f.run(f.initial, Iterator((0L, B), (1L, C)))
    assert(r1.isEmpty) // record still open
    val (fl1, st2) = f.flushWithState(st1)
    assert(fl1.map(_.segment) == Vector(1L))
    // a later record on the same key must NOT reuse segment 1
    val (r2, st3) = f.run(st2, Iterator((2L, B), (3L, C)))
    assert(r2.isEmpty)
    val (fl2, _) = f.flushWithState(st3)
    assert(fl2.map(_.segment) == Vector(2L))
    // lone continue -> multiline disabled: each line its own MATCHED
    // record even under DISCARD (nothing is "unmatched")
    val d = AggOps.MultilineFsm(None, Some(cRx), None, discardUnmatched = true)
    val (rd, _) = d.run(d.initial, Iterator((0L, C), (1L, U)))
    assert(rd.map(r => (r.segment, r.text)) ==
      Vector((1L, C), (2L, U)))
  }

  test("fsm and window modes emit the same schema (conv/order types preserved)") {
    val s = spark; import s.implicits._
    // numeric conv ids: the FSM's internal string grouping must not leak
    val df = Seq((7, 0, B), (7, 1, E)).toDF("conv_id", "turn_idx", "text")
    val fsmOut = AggOps.MultilineMerge(startPattern = Some(sRx),
      endPattern = Some(eRx))(df)
    val winOut = AggOps.MultilineMerge(startPattern = Some(sRx))(df)
    assert(fsmOut.schema.map(f => f.name -> f.dataType) ==
      winOut.schema.map(f => f.name -> f.dataType))
    assert(fsmOut.select("conv_id").head().getInt(0) == 7)
  }

  test("fsm modes distribute per conversation (two convs stay independent)") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", 0, B), ("a", 1, E),
      ("b", 0, B), ("b", 1, U), ("b", 2, E)
    ).toDF("conv_id", "turn_idx", "text")
    val out = AggOps.MultilineMerge(startPattern = Some(sRx),
      endPattern = Some(eRx))(df).collect()
      .map(r => (r.getString(0), r.getAs[String]("merged_text"))).toSet
    assert(out == Set(("a", s"$B\n$E"), ("b", s"$B\n$U\n$E")))
  }
}
