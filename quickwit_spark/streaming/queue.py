"""Queue-shaped sources (SQS / Pulsar / PubSub family): message-ack
semantics with exactly-once publish via per-message checkpoint dedup.

The reference's queue sources (quickwit-indexing/src/source/
queue_sources/{sqs_queue.rs,message.rs,coordinator.rs,visibility.rs})
differ from Kafka in delivery shape: there is no total per-partition
offset order — the queue redelivers any message whose visibility
timeout lapses before an acknowledge, so the consumer must make
processing idempotent PER MESSAGE. The reference does this by using
each message's stable identity (the notified file URI) as a source
checkpoint partition: a redelivered message whose checkpoint is already
committed is skipped and immediately re-acked
(coordinator.rs message dedup + checkpointed publish; visibility.rs
keeps in-flight messages invisible while indexing runs).

That contract is implemented here broker-independently, exactly like
streaming/kafka.py: `LocalDirQueue` is a durable directory-backed queue
with receive/visibility-timeout/ack semantics standing in for
SQS/Pulsar (the sandbox has no broker; the wiring point for a real one
is `receive()`'s return shape), and `ingest_queue_batch` is the
exactly-once consumer:

  crash AFTER publish, BEFORE ack  -> redelivery -> dedup hit -> re-ack
  crash BEFORE publish             -> redelivery -> normal processing
  duplicate delivery (at-least-once quirk) -> dedup hit -> ack

Both directions therefore converge on exactly-one manifest publish per
message.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass

import pandas as pd

from ..config import IndexConfig
from ..index.builder import build_partition
from ..index.manifest import CheckpointConflict, Manifest

# manifest checkpoint key namespace (kafka.py uses "kafka-<partition>")
_SRC = "queue-msg"

# terminal position for a processed message (message checkpoints are
# presence markers, not ordered offsets)
_DONE = "done"


@dataclass(frozen=True)
class QueueMessage:
    """One received message. message_id is the STABLE identity (same
    across redeliveries — SQS MessageId / the reference's file URI);
    ack_id is the per-delivery receipt handle (SQS ReceiptHandle)."""
    message_id: str
    ack_id: str
    payload: str  # JSON: {"docs": [...]} — a notification-style batch


class LocalDirQueue:
    """Durable directory-backed queue with SQS semantics: send/receive/
    ack + visibility timeout redelivery. One file per message; an
    in-flight message is marked with a visibility deadline; `now_fn` is
    injectable so tests drive the clock deterministically."""

    def __init__(self, root: str, visibility_sec: float = 30.0,
                 now_fn=time.time):
        self.root = root
        self.visibility_sec = float(visibility_sec)
        self.now_fn = now_fn
        os.makedirs(root, exist_ok=True)
        self._migrate_legacy_names()

    def _path(self, message_id: str) -> str:
        # ids are caller-supplied stable identities (the reference uses
        # file URIs) — percent-encode so '/' etc. cannot escape root
        from urllib.parse import quote
        return os.path.join(self.root, f"{quote(message_id, safe='')}.json")

    def _migrate_legacy_names(self) -> None:
        """One-time rename of pre-quoting message files to the canonical
        percent-encoded name. Before _path() quoted, an id containing
        ':' (or '/', which nested a subdirectory) landed at the raw
        os.path.join location; ack/change_visibility computed against
        the quoted path would miss those files forever (endless
        redelivery) and a dedup re-send would duplicate them."""
        from urllib.parse import quote
        with self._lock():
            for dirpath, _dirs, names in os.walk(self.root):
                at_root = os.path.abspath(dirpath) == os.path.abspath(
                    self.root)
                for name in names:
                    if not name.endswith(".json"):
                        continue
                    # cheap name-only precheck so this scan costs O(1)
                    # json reads on an already-canonical backlog: a
                    # root-level name with no quotable chars and no '%'
                    # is provably at its canonical path already (legacy
                    # raw id == its own quoting), so opening it would be
                    # a guaranteed no-op. Only names that quote would
                    # change, contain '%' (ambiguous: a raw legacy id
                    # may itself look pre-quoted), or sit in a legacy
                    # '/'-nested subdirectory need their message_id read.
                    stem = name[:-len(".json")]
                    if (at_root and "%" not in stem
                            and quote(stem, safe="") == stem):
                        continue
                    path = os.path.join(dirpath, name)
                    try:
                        with open(path) as f:
                            m = json.load(f)
                    except (OSError, json.JSONDecodeError, UnicodeDecodeError):
                        continue
                    mid = m.get("message_id")
                    if not isinstance(mid, str):
                        continue
                    canon = self._path(mid)
                    if os.path.abspath(canon) == os.path.abspath(path):
                        continue
                    if not os.path.exists(canon):
                        os.replace(path, canon)
                    else:
                        # canonical twin exists for the SAME id (quote
                        # is injective, so same canon => same id): the
                        # legacy-named copy is unreachable by ack()
                        # forever — delete it or it redelivers on
                        # every visibility cycle for eternity
                        os.unlink(path)

    @contextmanager
    def _lock(self):
        """Exclusive queue-level flock serializing the read-modify
        mutations (receive's deadline stamp, ack's delete,
        change_visibility). With mutations serialized, each one can use
        crash-atomic tmp-write + os.replace without the resurrection
        race (a replace re-creating a file a concurrent ack just
        os.remove'd) — and a consumer dying mid-rewrite releases the
        flock and leaves the ORIGINAL file intact, so the message is
        redelivered after its visibility deadline instead of being torn
        on disk forever."""
        with open(os.path.join(self.root, ".queue.lock"), "w") as lf:
            try:
                import fcntl
                fcntl.flock(lf, fcntl.LOCK_EX)
            except (ImportError, OSError):
                pass  # non-posix FS: single-consumer assumption
            yield

    def _atomic_rewrite(self, path: str, doc: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".msg-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(doc, f)
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def send(self, payload: str, message_id: str | None = None) -> str:
        mid = message_id or uuid.uuid4().hex
        path = self._path(mid)
        if message_id is not None and os.path.exists(path):
            # SQS dedup semantics: a duplicate send in the dedup window
            # is a NO-OP on the existing message. Overwriting would
            # wipe a live delivery's ack_id (its ack then fails) and
            # reset invisible_until to 0 (immediate double delivery).
            return mid
        # unique tmp (mkstemp), not a predictable <canon>.json.tmp:
        # concurrent sends sharing one tmp path can interleave their
        # writes and os.replace torn JSON into place — permanently
        # undeliverable; a crash also leaked the predictable tmp file
        self._atomic_rewrite(path, {"message_id": mid,
                                    "payload": payload,
                                    "invisible_until": 0.0})
        return mid

    def receive(self, max_messages: int = 10) -> list[QueueMessage]:
        """Visible messages become in-flight for visibility_sec; an
        expired deadline makes the message deliverable again (the
        at-least-once redelivery path)."""
        now = self.now_fn()
        out: list[QueueMessage] = []
        with self._lock():
            for name in sorted(os.listdir(self.root)):
                if not name.endswith(".json"):
                    continue
                path = os.path.join(self.root, name)
                try:
                    with open(path) as f:
                        m = json.load(f)
                except OSError:
                    continue  # racing enqueue
                except json.JSONDecodeError:
                    continue  # legacy torn file (pre-atomic-rewrite)
                if m["invisible_until"] > now:
                    continue
                ack_id = uuid.uuid4().hex
                m["invisible_until"] = now + self.visibility_sec
                m["ack_id"] = ack_id
                # crash-atomic: a consumer dying here leaves the
                # original file, not torn JSON — the message stays
                # deliverable (the lock rules out the replace-vs-ack
                # resurrection race)
                self._atomic_rewrite(path, m)
                out.append(QueueMessage(m["message_id"], ack_id,
                                        m["payload"]))
                if len(out) >= max_messages:
                    break
        return out

    def ack(self, message: QueueMessage) -> bool:
        """Delete iff this delivery's receipt is still current (a lapsed
        visibility deadline invalidates the receipt, like SQS)."""
        path = self._path(message.message_id)
        with self._lock():
            try:
                with open(path) as f:
                    m = json.load(f)
            except (OSError, json.JSONDecodeError):
                return False  # already acked / legacy torn file
            if m.get("ack_id") != message.ack_id:
                return False
            try:
                os.remove(path)
            except FileNotFoundError:
                return False
        return True

    def change_visibility(self, message: QueueMessage,
                          timeout_sec: float) -> bool:
        """Extend/shrink this delivery's visibility deadline (SQS
        ChangeMessageVisibility — the reference's visibility.rs keeps
        long-indexing messages invisible by re-upping the deadline).
        Fails if the receipt is no longer current. Crash-atomic
        tmp+os.replace under the queue lock (see _lock)."""
        path = self._path(message.message_id)
        with self._lock():
            try:
                with open(path) as f:
                    m = json.load(f)
            except (OSError, json.JSONDecodeError):
                return False  # acked / legacy torn file
            if m.get("ack_id") != message.ack_id:
                return False
            m["invisible_until"] = self.now_fn() + float(timeout_sec)
            self._atomic_rewrite(path, m)
        return True

    def pending(self) -> int:
        return sum(1 for n in os.listdir(self.root)
                   if n.endswith(".json"))


class SqsProtocolQueue:
    """SQS-protocol adapter: every operation is expressed as the AWS SQS
    JSON-protocol request/response DOCUMENT (SendMessage /
    ReceiveMessage / DeleteMessage / ChangeMessageVisibility /
    GetQueueAttributes — public AWS API shapes), routed through a
    pluggable `transport(action, request_doc) -> response_doc`.

    The default transport executes the documents against a
    LocalDirQueue (this runtime provisions no broker); the production
    wiring point is a transport that POSTs the SAME documents to a real
    or compatible endpoint (AWS SQS, ElasticMQ, LocalStack) with
    `X-Amz-Target: AmazonSQS.<action>` — nothing above the transport
    changes. ReceiptHandle packs (message_id, delivery receipt) so
    DeleteMessage needs only the handle, like real SQS.

    Duck-types LocalDirQueue's consumer surface (receive/ack/
    change_visibility/pending), so ingest_queue_batch takes either.
    Reference: quickwit-indexing/src/source/queue_sources/sqs_queue.rs.
    """

    def __init__(self, queue_url: str = "local://queue",
                 transport=None, local_root: str | None = None,
                 visibility_sec: float = 30.0, now_fn=time.time):
        self.queue_url = queue_url
        if transport is None:
            if local_root is None:
                raise ValueError("file-backed mode needs local_root "
                                 "(or pass a real transport)")
            self._local = LocalDirQueue(local_root, visibility_sec, now_fn)
            transport = self._local_transport
        self.transport = transport

    # -- the file-backed reference transport -------------------------------

    def _local_transport(self, action: str, doc: dict) -> dict:
        q = self._local
        if action == "SendMessage":
            body = doc["MessageBody"]
            mid = q.send(body,
                         message_id=doc.get("MessageDeduplicationId"))
            return {"MessageId": mid,
                    "MD5OfMessageBody":
                        hashlib.md5(body.encode()).hexdigest()}
        if action == "ReceiveMessage":
            msgs = q.receive(int(doc.get("MaxNumberOfMessages", 1)))
            return {"Messages": [
                # ack_id is always uuid4 hex (no '|'), so the handle is
                # parsed back at the LAST '|' — MessageDeduplicationIds
                # containing '|' (file URIs, composite keys) stay intact
                {"MessageId": m.message_id,
                 "ReceiptHandle": f"{m.message_id}|{m.ack_id}",
                 "Body": m.payload,
                 "MD5OfBody":
                     hashlib.md5(m.payload.encode()).hexdigest()}
                for m in msgs]}
        if action == "DeleteMessage":
            mid, _, ack = doc["ReceiptHandle"].rpartition("|")
            if not q.ack(QueueMessage(mid, ack, "")):
                return {"__type": "ReceiptHandleIsInvalid"}
            return {}
        if action == "ChangeMessageVisibility":
            mid, _, ack = doc["ReceiptHandle"].rpartition("|")
            if not q.change_visibility(QueueMessage(mid, ack, ""),
                                       float(doc["VisibilityTimeout"])):
                return {"__type": "ReceiptHandleIsInvalid"}
            return {}
        if action == "GetQueueAttributes":
            return {"Attributes":
                    {"ApproximateNumberOfMessages": str(q.pending())}}
        raise ValueError(f"unknown SQS action {action!r}")

    # -- consumer surface (QueueMessage.ack_id == ReceiptHandle) -----------

    def send(self, payload: str, message_id: str | None = None) -> str:
        doc = {"QueueUrl": self.queue_url, "MessageBody": payload}
        if message_id is not None:
            doc["MessageDeduplicationId"] = message_id
        return self.transport("SendMessage", doc)["MessageId"]

    def receive(self, max_messages: int = 10) -> list[QueueMessage]:
        resp = self.transport("ReceiveMessage", {
            "QueueUrl": self.queue_url,
            "MaxNumberOfMessages": max_messages,
            "AttributeNames": ["All"]})
        return [QueueMessage(m["MessageId"], m["ReceiptHandle"], m["Body"])
                for m in resp.get("Messages", [])]

    def ack(self, message: QueueMessage) -> bool:
        resp = self.transport("DeleteMessage", {
            "QueueUrl": self.queue_url,
            "ReceiptHandle": message.ack_id})
        return "__type" not in resp

    def change_visibility(self, message: QueueMessage,
                          timeout_sec: float) -> bool:
        resp = self.transport("ChangeMessageVisibility", {
            "QueueUrl": self.queue_url,
            "ReceiptHandle": message.ack_id,
            "VisibilityTimeout": int(timeout_sec)})
        return "__type" not in resp

    def pending(self) -> int:
        resp = self.transport("GetQueueAttributes", {
            "QueueUrl": self.queue_url,
            "AttributeNames": ["ApproximateNumberOfMessages"]})
        return int(resp["Attributes"]["ApproximateNumberOfMessages"])


def http_sqs_transport(endpoint: str, timeout: float = 30.0,
                       credentials: tuple | None = None,
                       region: str = "us-east-1", service: str = "sqs",
                       now_fn=time.time):
    """Transport POSTing the same SQS JSON-protocol documents to an
    HTTP endpoint (AWS SQS, ElasticMQ, LocalStack): one request per
    operation with `Content-Type: application/x-amz-json-1.0` and
    `X-Amz-Target: AmazonSQS.<action>` — the public AWS JSON protocol
    frame (reference consumer: quickwit-indexing/src/source/
    queue_sources/sqs_queue.rs, exercised against the same wire shapes
    in sqs_tests.rs). Error documents come back on non-2xx with a
    `__type` key, exactly like the in-process transport, so
    SqsProtocolQueue's consumer surface is transport-agnostic.

    stdlib urllib only (no HTTP client dependency). With
    ``credentials=(access_key, secret_key[, session_token])`` every
    request is SigV4-signed (streaming/sigv4.py, AWS-test-vector
    pinned) so the transport can talk to real AWS SQS; without
    credentials it suits IAM-less endpoints (ElasticMQ/LocalStack) or
    a signing proxy. Smoke-tested end-to-end against an in-process
    loopback http.server running the file-backed queue, including a
    server-side signature re-verification
    (test_queue_source.test_http_transport_loopback_exactly_once,
    test_http_transport_sigv4_loopback)."""
    import urllib.error
    import urllib.request

    def transport(action: str, doc: dict) -> dict:
        body = json.dumps(doc).encode()
        headers = {
            "Content-Type": "application/x-amz-json-1.0",
            "X-Amz-Target": f"AmazonSQS.{action}",
        }
        if credentials is not None:
            from .sigv4 import sign_request
            ak, sk, *tok = credentials
            amz_date = time.strftime("%Y%m%dT%H%M%SZ",
                                     time.gmtime(now_fn()))
            headers = sign_request(
                "POST", endpoint, headers, body, access_key=ak,
                secret_key=sk, region=region, service=service,
                amz_date=amz_date,
                session_token=tok[0] if tok else None)
            # urllib sets Host itself from the URL; passing it twice
            # duplicates the header on the wire
            headers.pop("Host", None)
        req = urllib.request.Request(endpoint, data=body, method="POST",
                                     headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                payload = resp.read().decode() or "{}"
                return json.loads(payload)
        except urllib.error.HTTPError as e:
            # errors="replace": a gzip/Latin-1 error body must not turn
            # into a UnicodeDecodeError that masks the HTTP status —
            # the body is only a diagnostic snippet here
            payload = e.read().decode(errors="replace")
            try:
                return json.loads(payload)  # {"__type": ...} error doc
            except json.JSONDecodeError:
                # non-JSON error body (proxy/LB HTML page): surface the
                # HTTP failure itself, not 'Expecting value: line 1' —
                # the status code and endpoint are the diagnosis
                raise urllib.error.HTTPError(
                    e.url, e.code,
                    f"{e.reason} (non-JSON body: {payload[:200]!r})",
                    e.headers, None) from e

    return transport


def _message_key(message_id: str) -> str:
    return f"{_SRC}:{message_id}"


def ingest_queue_batch(messages: list[QueueMessage], config: IndexConfig,
                       queue: LocalDirQueue | None = None,
                       spark=None, build_partitions: int = 4) -> int:
    """Process one received batch exactly-once and ack it.

    Returns the number of NEWLY published messages (redeliveries count
    0 but are still acked). The publish commits one checkpoint delta
    per fresh message (from=None -> "done"), atomically with the
    segment rows — the same manifest transaction the Kafka path uses,
    so a crash between publish and ack converges via dedup on
    redelivery."""
    manifest = Manifest.load_or_create(
        config.index_dir, config.index_uid,
        config.manifest_config())
    segments_root = os.path.join(config.index_dir, "segments")
    os.makedirs(segments_root, exist_ok=True)

    fresh = [m for m in messages
             if manifest.checkpoint(_message_key(m.message_id)) is None]
    published = 0
    if fresh:
        frames = []
        for m in fresh:
            docs = json.loads(m.payload)["docs"]
            pdf = pd.DataFrame(docs)
            # deterministic per-message partition id (content-addressed
            # segment ids then make replays byte-identical, like the
            # kafka batch path)
            pid = (1 << 42) + int.from_bytes(
                hashlib.sha256(m.message_id.encode()).digest()[:8],
                "little")
            pdf["_pid"] = pid
            frames.append(pdf)
        rows: list[dict] = []
        nonempty = [pdf for pdf in frames if len(pdf)]
        if spark is not None and len(nonempty) > 1:
            # one narrow task per message — queue messages are
            # independent units, no shuffle needed
            sc = spark.sparkContext
            bc_cfg = sc.broadcast(config)
            built = sc.parallelize(nonempty, len(nonempty)).map(
                lambda pdf: build_partition(pdf, bc_cfg.value,
                                            segments_root)).collect()
            rows = [r for seg_rows in built for r in seg_rows]
        else:
            for pdf in nonempty:
                rows.extend(build_partition(pdf, config, segments_root))
        delta = {_message_key(m.message_id): (None, _DONE) for m in fresh}
        try:
            manifest.publish(rows, checkpoint_delta=delta)
            published = len(fresh)
        except CheckpointConflict:
            # a concurrent consumer committed SOME of this batch's
            # messages between our dedup check and the publish; fall
            # through — the committed-checkpoint ack filter below leaves
            # the still-unpublished messages in the queue for redelivery
            # (acking them here would lose their docs forever)
            published = 0
    if queue is not None:
        # ack ONLY messages whose checkpoint is durably committed.
        # `manifest` is already fresh: publish's _locked_fresh re-read
        # the on-disk state (including a concurrent consumer's
        # commits) before succeeding OR raising, so a second full
        # manifest load+parse per batch bought nothing; a stale view
        # on the no-publish path only under-acks, which is the safe
        # direction (redelivery, deduped by checkpoint)
        for m in messages:
            if manifest.checkpoint(_message_key(m.message_id)) \
                    is not None:
                queue.ack(m)
    return published


def processed_message_ids(config: IndexConfig) -> set[str]:
    """Message identities already published (resume/debug surface)."""
    m = Manifest.load(config.index_dir)
    pfx = f"{_SRC}:"
    return {str(k)[len(pfx):] for k in m.data["checkpoints"]
            if str(k).startswith(pfx)}
