package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import PgWireClient.{PgProtocolException, ScramClient}

/** SCRAM-SHA-256 client math pinned to the RFC 7677 §3 test vector
  * (user "user", password "pencil", both nonces given by the RFC), plus
  * the two tamper paths a wire client must refuse: a server nonce that
  * does not extend the client's (MITM splice) and a server signature
  * that does not match the derived verifier (impersonation). The live
  * exchange against a real Postgres is in PgLiveRoundTripSpec.
  */
class ScramSpec extends AnyFunSuite {

  private val ClientNonce = "rOprNGfwEbeRWgbNEkqO"
  private val ServerFirst =
    "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"

  private def vectorClient() =
    new ScramClient("pencil", Some(ClientNonce), userForTest = "user")

  test("RFC 7677 vector: client-first-message") {
    assert(vectorClient().clientFirstMessage ==
      "n,,n=user,r=rOprNGfwEbeRWgbNEkqO")
  }

  test("RFC 7677 vector: client-final-message carries the exact proof") {
    assert(vectorClient().clientFinalMessage(ServerFirst) ==
      "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
  }

  test("RFC 7677 vector: server signature verifies; a tampered one does not") {
    val ok = vectorClient()
    val _ = ok.clientFinalMessage(ServerFirst)
    ok.verifyServerFinal("v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")

    val bad = vectorClient()
    val _2 = bad.clientFinalMessage(ServerFirst)
    val e = intercept[PgProtocolException](
      bad.verifyServerFinal("v=AAAATRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="))
    assert(e.getMessage.contains("impersonation"))
  }

  test("a server nonce that does not extend the client nonce is refused") {
    val c = vectorClient()
    val e = intercept[PgProtocolException](c.clientFinalMessage(
      "r=EVILNONCEhvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
        "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"))
    assert(e.getMessage.contains("MITM"))
  }

  test("production nonces are fresh and base64-printable (no comma)") {
    val a = new ScramClient("pw").clientFirstMessage
    val b = new ScramClient("pw").clientFirstMessage
    assert(a != b)
    val nonce = a.stripPrefix("n,,n=,r=")
    assert(nonce.nonEmpty && !nonce.contains(","))
  }
}
