"""Users, roles and authorization (reference ``tinyolap/users.py:1-41``,
``tinyolap/authorization.py:9-69``).

The reference defines four capability tiers twice — ``authorization.py``
as Viewer/Editor/Owner/Admin classes, ``users.py`` as a
READER/WRITER/EDITOR/ADMIN enum.  Semantics (docstrings in both files):

- READER (Viewer): read-only access to cube data.
- WRITER (Editor): reader + write cell values, splash, import, history.
- EDITOR (Owner): writer + modify structure — dimensions, subsets,
  attributes, cubes, rules.
- ADMIN: editor + manage users and roles.

This is driver-side metadata (a user registry is KBs — never a Spark
job); enforcement happens at the public entry points:
:meth:`~tinyolap_spark.database.Database.require` and the REST/GraphQL
layer (``api.py``).  Passwords are stored as salted PBKDF2 hashes.
"""

from __future__ import annotations

import hashlib
import secrets
from enum import IntEnum
from typing import Iterator, Optional

from .metadata import TinyOlapError


class NotAuthorizedError(TinyOlapError):
    """An action was attempted by a user whose role does not permit it."""


class UserRole(IntEnum):
    """Capability-ordered roles: a user may perform an action iff
    ``user.role >= action's minimum role`` (reference enumerates the same
    four tiers; its raw enum values are registry ids, not an ordering, so
    we use comparable values and keep the names)."""

    READER = 0
    WRITER = 1
    EDITOR = 2
    ADMIN = 3

    @classmethod
    def parse(cls, value: "UserRole | str | int") -> "UserRole":
        if isinstance(value, cls):
            return value
        if isinstance(value, int):
            return cls(value)
        try:
            return cls[str(value).upper()]
        except KeyError:
            raise TinyOlapError(f"unknown role {value!r}") from None


# action name -> minimum role required (reference authorization.py
# docstrings enumerate exactly these capability groups)
ACTION_MIN_ROLE: dict[str, UserRole] = {
    "read": UserRole.READER,
    "write": UserRole.WRITER,       # cell writes, splash, import, history
    "model": UserRole.EDITOR,       # dims/subsets/attributes/cubes/rules
    "admin": UserRole.ADMIN,        # manage users and roles
}

_PBKDF2_ITERS = 100_000


def _hash_password(password: str, salt_hex: str) -> str:
    return hashlib.pbkdf2_hmac(
        "sha256", password.encode(), bytes.fromhex(salt_hex), _PBKDF2_ITERS
    ).hex()


class User:
    """A named user with a role and an optional password (reference
    ``authorization.py:41-69`` — name/password/role with setters)."""

    def __init__(
        self,
        name: str,
        password: Optional[str] = None,
        role: "UserRole | str" = UserRole.ADMIN,
    ):
        self._name = name
        self._role = UserRole.parse(role)
        self._salt: Optional[str] = None
        self._password_hash: Optional[str] = None
        if password is not None:
            self.password = password

    @property
    def name(self) -> str:
        return self._name

    def rename(self, new_name: str) -> None:
        self._name = new_name

    @property
    def role(self) -> UserRole:
        return self._role

    @role.setter
    def role(self, value: "UserRole | str") -> None:
        self._role = UserRole.parse(value)

    @property
    def password(self) -> Optional[str]:
        # hash only — the cleartext is never retained (the reference keeps
        # it in memory; we do not)
        return self._password_hash

    @password.setter
    def password(self, value: Optional[str]) -> None:
        if value is None:
            self._salt = None
            self._password_hash = None
        else:
            self._salt = secrets.token_bytes(16).hex()
            self._password_hash = _hash_password(value, self._salt)

    def verify_password(self, password: Optional[str]) -> bool:
        if self._password_hash is None:
            return password is None or password == ""
        if password is None:
            return False
        return secrets.compare_digest(
            _hash_password(password, self._salt), self._password_hash
        )

    def can(self, action: str) -> bool:
        try:
            need = ACTION_MIN_ROLE[action]
        except KeyError:
            raise TinyOlapError(f"unknown action {action!r}") from None
        return self._role >= need

    def to_dict(self) -> dict:
        return {
            "name": self._name,
            "role": self._role.name,
            "salt": self._salt,
            "password_hash": self._password_hash,
        }

    @classmethod
    def from_dict(cls, data: dict) -> "User":
        u = cls(data["name"], role=data.get("role", "ADMIN"))
        u._salt = data.get("salt")
        u._password_hash = data.get("password_hash")
        return u

    def __repr__(self) -> str:
        return f"User({self._name!r}, role={self._role.name})"


class UserCollection:
    """User registry of a database (reference ``users.py:19-29`` —
    created with a default ``admin`` user)."""

    def __init__(self):
        self._users: dict[str, User] = {}
        self._users["admin"] = User("admin", role=UserRole.ADMIN)

    def add(
        self,
        name: str,
        password: Optional[str] = None,
        role: "UserRole | str" = UserRole.READER,
    ) -> User:
        key = name.lower()
        if key in self._users:
            raise TinyOlapError(f"user '{name}' already exists")
        u = User(name, password, role)
        self._users[key] = u
        return u

    def remove(self, name: str) -> None:
        key = name.lower()
        user = self._users.get(key)
        if user is None:
            raise TinyOlapError(f"no such user '{name}'")
        admins = [u for u in self._users.values() if u.role == UserRole.ADMIN]
        if user.role == UserRole.ADMIN and len(admins) == 1:
            raise TinyOlapError("cannot remove the last admin user")
        del self._users[key]

    def get(self, name: str) -> Optional[User]:
        u = self._users.get(name.lower())
        if u is not None:
            return u
        # a User.rename() leaves the dict keyed by the old name (the
        # reference's rename mutates the object only); re-key lazily so
        # lookups by either the live name work and persistence (which
        # re-keys by u.name) agrees with in-session behavior
        for key, cand in list(self._users.items()):
            if cand.name.lower() == name.lower():
                del self._users[key]
                self._users[cand.name.lower()] = cand
                return cand
        return None

    def authenticate(
        self, name: str, password: Optional[str] = None
    ) -> Optional[User]:
        """Name+password check; returns the User or None."""
        u = self.get(name)
        if u is not None and u.verify_password(password):
            return u
        return None

    def __getitem__(self, name: str) -> User:
        u = self.get(name)
        if u is None:
            raise TinyOlapError(f"no such user '{name}'")
        return u

    def __contains__(self, name: str) -> bool:
        return name.lower() in self._users

    def __iter__(self) -> Iterator[User]:
        return iter(self._users.values())

    def __len__(self) -> int:
        return len(self._users)

    def to_list(self) -> list[dict]:
        return [u.to_dict() for u in self._users.values()]

    @classmethod
    def from_list(cls, data: list[dict]) -> "UserCollection":
        coll = cls()
        coll._users.clear()
        for item in data:
            u = User.from_dict(item)
            coll._users[u.name.lower()] = u
        if "admin" not in coll._users and not any(
            u.role == UserRole.ADMIN for u in coll._users.values()
        ):
            coll._users["admin"] = User("admin", role=UserRole.ADMIN)
        return coll
