package graft

import graft.ops.Sanitize
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure (driver-side) engine functions. */
object SanitizeProps extends Properties("Sanitize") {

  property("output always matches [a-z_][a-z0-9_]*") =
    Prop.forAll(Gen.asciiStr, Gen.choose(0, 99)) { (raw, idx) =>
      Sanitize.sanitizeName(raw, idx).matches("[a-z_][a-z0-9_]*")
    }

  property("unicode input still yields a valid identifier") =
    Prop.forAll(Gen.listOf(Gen.choose(32.toChar, 0x2FFF.toChar)).map(_.mkString),
      Gen.choose(0, 99)) { (raw, idx) =>
      Sanitize.sanitizeName(raw, idx).matches("[a-z_][a-z0-9_]*")
    }

  private val cleanName: Gen[String] = for {
    h <- Gen.oneOf(('a' to 'z') :+ '_')
    t <- Gen.listOf(Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ '_'))
  } yield (h :: t).mkString

  property("already-clean names are fixpoints (unless pandas-artifact-shaped)") =
    Prop.forAll(cleanName, Gen.choose(0, 99)) { (name, idx) =>
      Sanitize.sanitizeName(name, idx) == name || name.startsWith("unnamed")
    }

  property("sanitization is idempotent") =
    Prop.forAll(Gen.asciiStr, Gen.choose(0, 99)) { (raw, idx) =>
      val once = Sanitize.sanitizeName(raw, idx)
      once.startsWith("unnamed") || Sanitize.sanitizeName(once, idx) == once
    }
}
