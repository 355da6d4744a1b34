package graft.backend.glue

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing, from the public specification
  * (docs.aws.amazon.com/IAM/latest/UserGuide/create-signed-request.html):
  * canonical request → string-to-sign → HMAC key derivation chain →
  * Authorization header. Self-contained so the Glue backend needs no AWS
  * SDK — the reference reaches Glue through the SDK's signer; this build
  * has no SDK jars, and the algorithm itself is ~40 lines of HMAC.
  */
object AwsSigV4 {

  final case class Credentials(accessKeyId: String, secretAccessKey: String,
      sessionToken: Option[String] = None)

  private def sha256Hex(data: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(data)
      .map("%02x".format(_)).mkString

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** Headers to add to a POST request against an x-amz-json service:
    * x-amz-date, optional x-amz-security-token, and Authorization.
    * `headers` must already contain every header to be signed
    * (content-type, host, x-amz-target). `timestamp` is
    * yyyyMMdd'T'HHmmss'Z' — injectable for deterministic tests. */
  def signedHeaders(
      method: String, path: String,
      headers: Map[String, String], payload: Array[Byte],
      region: String, service: String, creds: Credentials,
      timestamp: String): Map[String, String] = {
    val date = timestamp.take(8)
    val withDate = headers ++ Map("x-amz-date" -> timestamp) ++
      creds.sessionToken.map("x-amz-security-token" -> _)
    val canonical = withDate.map { case (k, v) => k.toLowerCase -> v.trim }
    val signedList = canonical.keys.toSeq.sorted
    val canonicalRequest = Seq(
      method,
      if (path.isEmpty) "/" else path,
      "", // canonical query string (Glue JSON posts carry no query)
      signedList.map(k => s"$k:${canonical(k)}\n").mkString,
      signedList.mkString(";"),
      sha256Hex(payload)).mkString("\n")
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", timestamp, scope,
      sha256Hex(canonicalRequest.getBytes(StandardCharsets.UTF_8))).mkString("\n")
    val kDate = hmac(s"AWS4${creds.secretAccessKey}".getBytes(StandardCharsets.UTF_8), date)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    val kSigning = hmac(kService, "aws4_request")
    val signature = hmac(kSigning, stringToSign).map("%02x".format(_)).mkString
    Map(
      "x-amz-date" -> timestamp,
      "Authorization" -> (s"AWS4-HMAC-SHA256 Credential=${creds.accessKeyId}/$scope, " +
        s"SignedHeaders=${signedList.mkString(";")}, Signature=$signature")) ++
      creds.sessionToken.map("x-amz-security-token" -> _)
  }

  def nowTimestamp(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
}
