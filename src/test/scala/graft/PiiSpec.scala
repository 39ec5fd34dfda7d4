package graft

import graft.operators.PiiSuite

class PiiSpec extends SparkSpecBase {

  test("email mask keeps first char + domain, hides the rest") {
    PiiSuite.queries("pii_mask_email")(spark, sf).collect().foreach { r =>
      val (email, masked) = (r.getString(1), r.getString(2))
      assert(masked.head == email.head)
      assert(masked.substring(masked.indexOf('@')) == email.substring(email.indexOf('@')))
      val local = masked.substring(1, masked.indexOf('@'))
      assert(local.forall(_ == '*') && local.nonEmpty)
    }
  }

  test("phone/ssn/card masks keep exactly the last 4 digits") {
    PiiSuite.queries("pii_mask_phone")(spark, sf).collect().foreach { r =>
      assert(r.getString(2) == "(***) ***-" + r.getString(1).takeRight(4))
    }
    PiiSuite.queries("pii_mask_card")(spark, sf).collect().foreach { r =>
      val (card, masked) = (r.getString(1), r.getString(2))
      assert(masked.takeRight(4) == card.takeRight(4))
      assert(masked.dropRight(4).forall(_ == '*'))
    }
  }

  test("hashing is 64-hex, deterministic, and not identity") {
    val rows = PiiSuite.queries("pii_hash")(spark, sf).collect()
    val again = PiiSuite.queries("pii_hash")(spark, sf).collect()
    assert(rows.map(_.getString(1)).sameElements(again.map(_.getString(1))))
    rows.foreach { r =>
      assert(r.getString(1).matches("[0-9a-f]{64}"))
    }
  }

  test("conditional transform masks only the BUILDING segment") {
    PiiSuite.queries("conditional_transform")(spark, sf).collect().foreach { r =>
      val masked = r.getString(3).contains("*")
      if (r.getString(1) == "BUILDING") assert(masked) else assert(!masked)
    }
  }
}
