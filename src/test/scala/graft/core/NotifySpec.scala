package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Release-notification composition and gating (release.go:178–206,
  * status.go:424–460). */
class NotifySpec extends AnyFunSuite {

  test("topic release message matches the reference format") {
    val m = Notify.topicRelease("inventory", "users", "org/mask-repo",
      "mask.yaml", "aaaa111122223333", "bbbb444455556666")
    assert(m == "Released table *inventory.users* with mask-version: " +
      "<https://github.com/org/mask-repo/blob/bbbb444455556666/mask.yaml" +
      " | bbbb44> and <https://github.com/org/mask-repo/compare/" +
      "aaaa111122223333...bbbb444455556666 | mask-changes>.")
  }

  test("fleet message only fires when everything is live on a new version") {
    def gate(all: Int = 3, rel: Int = 3, reloading: Int = 0,
        realtime: Int = 0, cur: String = "a", des: String = "b") =
      Notify.releaseAll("sink", all, rel, reloading, realtime,
        "org/mask-repo", "mask.yaml", cur, des)
    assert(gate().contains("sink has 3 tables live with mask-version: " +
      "<https://github.com/org/mask-repo/blob/b/mask.yaml | b>"))
    assert(gate(rel = 2).isEmpty)         // not everything released
    assert(gate(reloading = 1).isEmpty)   // reload in flight
    assert(gate(realtime = 1).isEmpty)    // realtime catch-up in flight
    assert(gate(des = "").isEmpty)        // no desired version
    assert(gate(cur = "b").isEmpty)       // already on it
  }

  test("buffer transport collects; short sha only truncates long ids") {
    val b = new Notify.Buffer
    b.notify("one"); b.notify("two")
    assert(b.messages == Seq("one", "two"))
    assert(Notify.shortSha("abc") == "abc")
    assert(Notify.shortSha("abcdef0123") == "abcdef")
  }
}
