"""Multi-user accounts and sessions for the pipe HTTP server.

Reference parity: the reference API has per-user accounts with hashed
passwords (meerschaum/core/User/__init__.py, api/routes/_users.py:42-236)
and login-issued bearer sessions (api/routes/_login.py:17-154,
api/dash/sessions.py — sessions live in server memory). This is the
stdlib equivalent:

* ``UserRegistry`` — PBKDF2-SHA256 password hashes (per-user random
  salt) in a ``users.json`` document beside the pipe registry; no
  plaintext ever touches disk.
* ``SessionManager`` — opaque ``secrets.token_urlsafe`` bearer tokens
  with a TTL, held in process memory like the reference's session dict.

The server wires these behind ``POST /login`` and the ``/users`` routes;
see ``sources/server.py``.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import os
import secrets
import threading
import time

PBKDF2_ITERATIONS = 390_000  # hashlib docs' 2024+ recommendation for sha256


def hash_password(password: str, salt: bytes | None = None) -> dict:
    salt = salt if salt is not None else secrets.token_bytes(16)
    dk = hashlib.pbkdf2_hmac("sha256", password.encode("utf-8"), salt,
                             PBKDF2_ITERATIONS)
    return {"algo": "pbkdf2_sha256", "iterations": PBKDF2_ITERATIONS,
            "salt": salt.hex(), "hash": dk.hex()}


def verify_password(password: str, rec: dict) -> bool:
    if not rec or rec.get("algo") != "pbkdf2_sha256":
        return False
    dk = hashlib.pbkdf2_hmac(
        "sha256", password.encode("utf-8"), bytes.fromhex(rec["salt"]),
        int(rec.get("iterations", PBKDF2_ITERATIONS)))
    return hmac.compare_digest(dk.hex(), rec.get("hash", ""))


class UserRegistry:
    """Username → {password record, type, attributes} persisted as one
    JSON document in the instance directory (the metadata scale of the
    reference's users table — accounts, not data)."""

    def __init__(self, instance: str):
        self.path = os.path.join(instance, "users.json")
        self._lock = threading.Lock()

    # ------------------------------------------------------------- storage

    def _load(self) -> dict:
        try:
            with open(self.path, "r", encoding="utf-8") as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _save(self, doc: dict) -> None:
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)  # atomic publish

    # ------------------------------------------------------------ accounts

    def register(self, username: str, password: str, user_type: str = "user",
                 attributes: dict | None = None) -> bool:
        """False when the username is taken. The FIRST account ever
        registered becomes an admin (bootstrap — the reference seeds an
        admin the same way on a fresh instance)."""
        if not username or not password:
            raise ValueError("username and password are both required")
        with self._lock:
            doc = self._load()
            if username in doc:
                return False
            if not doc:
                user_type = "admin"
            doc[username] = {"password": hash_password(password),
                             "type": user_type,
                             "attributes": attributes or {}}
            self._save(doc)
            return True

    #: static dummy record hashed for UNKNOWN usernames so /login takes
    #: the same ~PBKDF2 time whether or not the account exists — without
    #: it, response timing enumerates valid usernames. (Salt/hash values
    #: are arbitrary constants; the comparison always fails.)
    _DUMMY_RECORD = {"algo": "pbkdf2_sha256", "iterations": PBKDF2_ITERATIONS,
                     "salt": "00" * 16, "hash": "00" * 32}

    def verify(self, username: str, password: str) -> bool:
        rec = self._load().get(username)
        if not rec:
            verify_password(password, self._DUMMY_RECORD)
            return False
        return verify_password(password, rec["password"])

    def edit(self, username: str, password: str | None = None,
             attributes: dict | None = None) -> bool:
        with self._lock:
            doc = self._load()
            if username not in doc:
                return False
            if password:
                doc[username]["password"] = hash_password(password)
            if attributes is not None:
                doc[username]["attributes"] = attributes
            self._save(doc)
            return True

    def delete(self, username: str) -> bool:
        with self._lock:
            doc = self._load()
            if username not in doc:
                return False
            del doc[username]
            self._save(doc)
            return True

    def get(self, username: str) -> dict | None:
        """Public view: type + attributes, never the password record."""
        rec = self._load().get(username)
        if rec is None:
            return None
        return {"username": username, "type": rec.get("type", "user"),
                "attributes": rec.get("attributes", {})}

    def list_users(self) -> list[str]:
        return sorted(self._load())

    def is_admin(self, username: str) -> bool:
        rec = self._load().get(username)
        return bool(rec) and rec.get("type") == "admin"

    def __len__(self) -> int:
        return len(self._load())


class SessionManager:
    """Opaque bearer tokens with TTL, in process memory (reference
    api/dash/sessions.py keeps its session dict in-process too).
    ``_now`` is injectable for deterministic expiry tests."""

    def __init__(self, ttl_seconds: float = 3600.0, _now=time.time):
        self.ttl = float(ttl_seconds)
        self._now = _now
        self._lock = threading.Lock()
        self._sessions: dict[str, tuple[str, float]] = {}

    def login(self, username: str) -> str:
        token = secrets.token_urlsafe(32)
        with self._lock:
            self._prune_locked()
            self._sessions[token] = (username, self._now() + self.ttl)
        return token

    def validate(self, token: str) -> str | None:
        with self._lock:
            rec = self._sessions.get(token)
            if rec is None:
                return None
            username, expires = rec
            if self._now() >= expires:
                del self._sessions[token]
                return None
            return username

    def logout(self, token: str) -> bool:
        with self._lock:
            return self._sessions.pop(token, None) is not None

    def revoke_user(self, username: str) -> int:
        """Invalidate every live session of one user — MUST run when the
        account is deleted or its password changes, else the stale token
        keeps full access until TTL."""
        with self._lock:
            stale = [t for t, (u, _) in self._sessions.items()
                     if u == username]
            for t in stale:
                del self._sessions[t]
            return len(stale)

    def _prune_locked(self) -> None:
        now = self._now()
        for t in [t for t, (_, exp) in self._sessions.items() if now >= exp]:
            del self._sessions[t]
