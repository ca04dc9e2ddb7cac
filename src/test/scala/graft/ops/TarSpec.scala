package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** X279 byte contract: USTAR build → parse must round-trip names,
  * sizes, offsets and payloads exactly, validate checksums, honor
  * 512-block padding edges, and fail soft on corruption. */
class TarSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes("UTF-8")

  test("round-trip: names, sizes, offsets, payloads, checksums") {
    val members = Seq(
      "a.txt" -> bytes("hello"),
      "b.json" -> bytes("""{"k":1}"""),
      "empty.bin" -> Array.empty[Byte],
      "exact.bin" -> Array.fill[Byte](512)(7),
      "big.bin" -> Array.tabulate[Byte](1300)(i => (i % 251).toByte))
    val tar = Tar.buildArchive(members)
    // total = per-member 512 header + padded payload, + 1024 EOA
    val expectedLen = members.map { case (_, p) =>
      512 + ((p.length + 511) / 512) * 512
    }.sum + 1024
    assert(tar.length === expectedLen)
    val es = Tar.parse(tar)
    assert(es.map(_.name) === members.map(_._1))
    assert(es.map(_.size) === members.map(_._2.length.toLong))
    assert(es.forall(_.chksumOk))
    assert(es.forall(_.magicOk))
    assert(es.forall(_.typeflag === '0'))
    es.zip(members).foreach { case (e, (_, p)) =>
      assert(e.payload.toSeq === p.toSeq)
    }
    // offsets: each header starts where the previous padded member ends
    val offs = es.map(_.headerOffset)
    assert(offs.head === 0L)
    offs.zip(es).sliding(2).foreach {
      case Seq((o1, e1), (o2, _)) =>
        assert(o2 === o1 + 512 + ((e1.size + 511) / 512) * 512)
      case _ => ()
    }
  }

  test("corrupted header byte fails the checksum, others unaffected") {
    val tar = Tar.buildArchive(Seq(
      "x.txt" -> bytes("one"), "y.txt" -> bytes("two")))
    tar(3) = (tar(3) ^ 0x01).toByte // flip a bit in member 0's name
    val es = Tar.parse(tar)
    assert(es.size === 2)
    assert(!es(0).chksumOk)
    assert(es(1).chksumOk)
  }

  test("truncated archive (no EOA blocks) stops at the buffer edge") {
    val tar = Tar.buildArchive(Seq("x.txt" -> bytes("payload here")))
    val cut = java.util.Arrays.copyOfRange(tar, 0, 512 + 8)
    val es = Tar.parse(cut)
    assert(es.size === 1)
    assert(es.head.name === "x.txt")
    assert(es.head.payload.length === 8) // only the bytes present
  }

  test("non-USTAR 512-blocks are flagged via magicOk=false") {
    // plausible-looking garbage: nonzero block with valid octal digits
    // where size/chksum live, but no 'ustar' magic at offset 257
    val fake = new Array[Byte](1024)
    java.util.Arrays.fill(fake, 0, 512, '0'.toByte)
    val es = Tar.parse(fake)
    assert(es.size === 1)
    assert(!es.head.magicOk)
    // a real archive's members all carry the magic
    assert(Tar.parse(Tar.buildArchive(Seq("a" -> bytes("x"))))
      .forall(_.magicOk))
  }

  test("octal field overflow is rejected, boundary value accepted") {
    // 12-byte size field holds 11 octal digits: max 8^11 - 1 (~8.6 GB,
    // USTAR's per-member limit). One past it must throw, not smear
    // digits into the adjacent mtime/chksum fields.
    val max11 = (1L << 33) - 1 // 8^11 - 1 = 2^33 - 1
    assert(Tar.octal(max11, 12).length === 12)
    intercept[IllegalArgumentException] { Tar.octal(max11 + 1, 12) }
  }

  test("100-byte names are accepted, 101 rejected at build") {
    val name100 = "d/" + ("a" * 94) + ".txt"
    assert(name100.length === 100)
    val es = Tar.parse(Tar.buildArchive(Seq(name100 -> bytes("x"))))
    assert(es.head.name === name100)
    intercept[IllegalArgumentException] {
      Tar.buildArchive(Seq(("a" * 101) -> bytes("x")))
    }
  }
}
