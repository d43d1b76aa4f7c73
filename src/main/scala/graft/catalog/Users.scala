package graft.catalog

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** One granted privilege: a resource pattern and its actions — the
  * reference's privilege shape
  * (/root/reference/aiotcvectordb/client/stub.py:1001 grant_to_user:
  * `{"resource": "db0.*", "actions": ["read"]}`). */
final case class UserPrivilege(resource: String, actions: Seq[String])

/** describe_user's payload (stub.py:960): name, creation time,
  * granted privileges. */
final case class UserInfo(user: String, createTime: String,
                          privileges: Seq[UserPrivilege])

/** Instance-level user registry — the reference's user/permission
  * family (stub.py:923–1060: create_user, drop_user, describe_user,
  * user_list, change_password, grant_to_user, revoke_from_user),
  * the last reference API family with no repo counterpart (r9
  * verdict). Auth plumbing for a hosted service, not a query
  * capability: state is one tiny JSON file per user under
  * `<root>/_users/` (the catalog-internal `_` prefix, invisible to
  * database listings), touched once at setup time — nothing here is
  * on a data path.
  *
  * Passwords are never stored: the file keeps a PBKDF2-HMAC-SHA256
  * digest with a per-user random salt (`pbkdf2:iters:salt:hash`);
  * verification is constant-time and still accepts (and upgrades on
  * change_password) legacy unsalted-SHA-256 records. Privileges merge
  * per resource on grant (action order preserved, duplicates
  * dropped) and subtract on revoke (a resource with no actions left
  * disappears) — the semantics a grant/revoke round-trip implies. */
final class Users(root: String) {

  private def usersDir: Path = Paths.get(root, "_users")
  private def userFile(user: String): Path =
    usersDir.resolve(validUser(user) + ".json")

  /** Usernames become filesystem path segments; same escape-proof
    * restriction as catalog names. */
  private def validUser(u: String): String = {
    require(u.matches("[A-Za-z0-9][A-Za-z0-9_.-]*"),
      s"invalid user name '$u' (allowed: [A-Za-z0-9][A-Za-z0-9_.-]*)")
    require(!u.contains(".."), s"invalid user name '$u'")
    u
  }

  /** PBKDF2-HMAC-SHA256 with a per-user random salt, persisted as
    * `pbkdf2:<iters>:<saltHex>:<hashHex>` — a leaked user file costs a
    * dictionary attacker ~iters hashes per guess instead of one
    * (advisor finding; the earlier single SHA-256 was trivially
    * attackable). JDK-builtin primitive, no new dependency. */
  private val Pbkdf2Iters = 100000

  private def hex(bs: Array[Byte]): String = bs.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def pbkdf2(password: String, salt: Array[Byte], iters: Int): Array[Byte] =
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(new javax.crypto.spec.PBEKeySpec(
        password.toCharArray, salt, iters, 256))
      .getEncoded

  private def digest(user: String, password: String): String = {
    val salt = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(salt)
    s"pbkdf2:$Pbkdf2Iters:${hex(salt)}:${hex(pbkdf2(password, salt, Pbkdf2Iters))}"
  }

  /** Constant-time verification against the stored record; legacy
    * unsalted-SHA-256 records (pre-round-11 files: bare 64-hex) still
    * verify, and upgrade to PBKDF2 on the next changePassword. A
    * MALFORMED record (truncated file, hand edit) verifies as false —
    * it must never throw out of a connection handshake (review
    * finding: unhex/toInt on garbage raised NumberFormatException). */
  private def digestMatches(stored: String, user: String, password: String): Boolean =
    try stored.split(":", -1) match {
      case Array("pbkdf2", iters, saltHex, hashHex) =>
        java.security.MessageDigest.isEqual(
          pbkdf2(password, unhex(saltHex), iters.toInt), unhex(hashHex))
      case _ =>
        java.security.MessageDigest.isEqual(
          java.security.MessageDigest.getInstance("SHA-256")
            .digest((user + ":" + password)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)),
          unhex(stored))
    } catch {
      case _: NumberFormatException | _: IllegalArgumentException => false
    }

  private val PrivPrefix = "priv."

  private def load(user: String): Map[String, String] = {
    require(userExists(user), s"user $user does not exist")
    Json.parse(Files.readString(userFile(user)))
  }

  /** Updates stage to a unique temp file and ATOMIC_MOVE into place —
    * a crash mid-write can never leave a truncated JSON that breaks
    * every later load (review finding). */
  private def store(user: String, entries: Map[String, String]): Unit = {
    Files.createDirectories(usersDir)
    val tmp = usersDir.resolve(
      validUser(user) + "." + java.util.UUID.randomUUID + ".tmp")
    Files.writeString(tmp, Json.render(entries))
    Files.move(tmp, userFile(user),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def userExists(user: String): Boolean = Files.exists(userFile(user))

  /** create_user (stub.py:923). Creating an existing user is an
    * error — silently resetting a password would be a grant bypass.
    * Enforced by the FILESYSTEM (CREATE_NEW), not just the pre-check:
    * two concurrent creates cannot both succeed (review finding — a
    * check-then-write race would let the loser silently replace the
    * winner's password). */
  def createUser(user: String, password: String): Unit = {
    require(!userExists(user), s"user $user already exists")
    val now = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    Files.createDirectories(usersDir)
    // stage to a temp file then hard-LINK it into place: link(2) fails
    // with EEXIST when the target exists, so the concurrent-create
    // loser fails AT THE FILESYSTEM — unlike ATOMIC_MOVE, whose Linux
    // rename(2) silently replaces an existing target (the JavaDoc
    // leaves exists-behavior implementation-specific; advisor
    // finding). Content stays atomic: the link publishes a fully
    // written file, a crash mid-write leaves only an orphan .tmp.
    val tmp = usersDir.resolve(
      validUser(user) + "." + java.util.UUID.randomUUID + ".tmp")
    val payload = Json.render(Map(
      "password" -> digest(user, password), "create_time" -> now))
    Files.writeString(tmp, payload)
    try Files.createLink(userFile(user), tmp)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalArgumentException(s"user $user already exists", e)
      case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
        // filesystems without hard links (FAT, some network mounts):
        // fall back to CREATE_NEW, which is still create-exclusive at
        // open(2) — only content atomicity on a crash mid-write is
        // weaker than the link path (review finding)
        try Files.write(userFile(user), payload.getBytes(
            java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        catch {
          case e: java.nio.file.FileAlreadyExistsException =>
            throw new IllegalArgumentException(s"user $user already exists", e)
        }
    } finally Files.deleteIfExists(tmp)
  }

  /** drop_user (stub.py:941) — idempotent, like dropDatabase. */
  def dropUser(user: String): Unit =
    Files.deleteIfExists(userFile(user))

  /** describe_user (stub.py:960): privileges sorted by resource (the
    * flat-JSON key order — deterministic across engines/sessions). */
  def describeUser(user: String): UserInfo = {
    val m = load(user)
    val privs = m.keys.filter(_.startsWith(PrivPrefix)).toSeq.sorted.map { k =>
      UserPrivilege(k.drop(PrivPrefix.length),
        m(k).split(",").toSeq.filter(_.nonEmpty))
    }
    UserInfo(user, m.getOrElse("create_time", ""), privs)
  }

  /** user_list (stub.py:983): every user on the instance. */
  def userList(): Seq[UserInfo] =
    if (!Files.isDirectory(usersDir)) Seq.empty
    else {
      val s = Files.list(usersDir)
      val names = try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json"))
        .toSeq.sorted
      finally s.close()
      names.map(describeUser)
    }

  /** change_password (stub.py:1000ish). */
  def changePassword(user: String, password: String): Unit =
    store(user, load(user) + ("password" -> digest(user, password)))

  /** True iff `password` is the user's current password (the check a
    * connection handshake performs; plaintext never persists).
    * Comparison is constant-time (MessageDigest.isEqual) — digest
    * strings never meet `==` (advisor finding). */
  def verifyPassword(user: String, password: String): Boolean =
    load(user).get("password").exists(digestMatches(_, user, password))

  /** grant_to_user (stub.py:1017): per-resource action-set UNION —
    * existing actions keep their order, new ones append, duplicates
    * drop. Actions must be non-empty and comma-free (they persist
    * comma-joined; an embedded ',' would silently split into two
    * actions on read and defeat a later revoke — review finding). */
  def grantToUser(user: String, privileges: Seq[UserPrivilege]): Unit = {
    privileges.foreach(p => p.actions.foreach(a =>
      require(a.nonEmpty && !a.contains(","),
        s"invalid action '$a' (must be non-empty and comma-free)")))
    val m = load(user)
    val merged = privileges.foldLeft(m) { (acc, p) =>
      val key = PrivPrefix + p.resource
      val existing = acc.get(key).map(_.split(",").toSeq.filter(_.nonEmpty))
        .getOrElse(Seq.empty)
      acc + (key -> (existing ++ p.actions.filterNot(existing.contains))
        .distinct.mkString(","))
    }
    store(user, merged)
  }

  /** revoke_from_user (stub.py:1046): per-resource action subtraction;
    * a resource with no actions left disappears; revoking an
    * ungranted action/resource is a no-op (the idempotent reading of
    * "operation success"). */
  def revokeFromUser(user: String, privileges: Seq[UserPrivilege]): Unit = {
    val m = load(user)
    val reduced = privileges.foldLeft(m) { (acc, p) =>
      val key = PrivPrefix + p.resource
      acc.get(key) match {
        case None => acc
        case Some(cur) =>
          val left = cur.split(",").toSeq.filter(_.nonEmpty)
            .filterNot(p.actions.contains)
          if (left.isEmpty) acc - key else acc + (key -> left.mkString(","))
      }
    }
    store(user, reduced)
  }
}
