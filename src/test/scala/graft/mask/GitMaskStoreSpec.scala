package graft.mask

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Version-to-version mask-config flow against a real git repo: two
  * commits of the config, the diff between them drives the reload
  * decision (mask_config.go:84–148 + controllers/mask_diff.go
  * semantics). */
class GitMaskStoreSpec extends AnyFunSuite {

  private val v1 =
    """non_pii_keys:
      |  customers:
      |    - c_name
      |  orders:
      |    - o_comment
      |""".stripMargin

  // v2 unmasks an extra customers column; orders untouched
  private val v2 =
    """non_pii_keys:
      |  customers:
      |    - c_name
      |    - c_address
      |  orders:
      |    - o_comment
      |""".stripMargin

  private def mkRepo(): (String, String, String) = {
    val dir = Files.createTempDirectory("graft-maskrepo").toString
    def git(args: String*): Unit = {
      val cmd = Seq("git", "-C", dir,
        "-c", "user.email=graft@test", "-c", "user.name=graft") ++ args
      val p = new ProcessBuilder(cmd: _*).inheritIO().start()
      assert(p.waitFor() == 0, s"git ${args.mkString(" ")} failed")
    }
    git("init", "-q")
    Files.writeString(Paths.get(dir, "mask.yaml"), v1)
    git("add", "mask.yaml")
    git("commit", "-q", "-m", "v1")
    val sha1 = GitMaskStore.resolve(dir, "HEAD")
    Files.writeString(Paths.get(dir, "mask.yaml"), v2)
    git("add", "mask.yaml")
    git("commit", "-q", "-m", "v2")
    val sha2 = GitMaskStore.resolve(dir, "HEAD")
    (dir, sha1, sha2)
  }

  test("load pinned versions; diff drives the reload set") {
    val (dir, sha1, sha2) = mkRepo()
    // each version loads as of its commit, not the working tree
    val c1 = GitMaskStore.load(dir, sha1, "mask.yaml")
    val c2 = GitMaskStore.load(dir, sha2, "mask.yaml")
    assert(c1.nonPii("customers", "c_name") && !c1.nonPii("customers", "c_address"))
    assert(c2.nonPii("customers", "c_address"))
    // reload decision: only customers' rules changed
    assert(GitMaskStore.changedTables(dir, sha1, sha2, "mask.yaml") ==
      Set("customers"))
    assert(!GitMaskStore.identical(dir, sha1, sha2, "mask.yaml"))
    // same version -> nothing to reload
    assert(GitMaskStore.identical(dir, sha2, sha2, "mask.yaml"))
    assert(GitMaskStore.changedTables(dir, sha2, "HEAD", "mask.yaml").isEmpty)
  }

  test("bad ref or path fails loudly with git's message") {
    val (dir, _, _) = mkRepo()
    val e = intercept[IllegalArgumentException] {
      GitMaskStore.show(dir, "no-such-ref", "mask.yaml")
    }
    assert(e.getMessage.contains("git show"))
    intercept[IllegalArgumentException] {
      GitMaskStore.show(dir, "HEAD", "absent.yaml")
    }
  }
}
