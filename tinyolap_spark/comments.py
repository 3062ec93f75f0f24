"""Cell comments (reference ``tinyolap/comments.py:5-111``).

A comment thread can attach to ANY cell — base or aggregated — keyed by
the cell's idx-address.  As in the reference, comments live in a flat
driver-side table (they are sparse human annotations, KBs even for a
heavily-annotated model — never a Spark job); they are not part of
multidimensional space.  At warehouse scale the same shape persists as a
side table keyed by address, which is exactly how ``Database.save``
stores them (inside the metadata document).

The reference's random Faker-generated demo comments
(``comments.py:85-89``, marked ``todo remove``) are intentionally not
reproduced.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator, Optional, Sequence


def _now() -> datetime:
    return datetime.now(timezone.utc)


class CellCommentPost:
    """One comment from one user (reference ``comments.py:5-34``).
    Editing the text refreshes the timestamp, like the reference setter."""

    def __init__(
        self,
        comment: str,
        user: str = "admin",
        timestamp: Optional[datetime] = None,
    ):
        self._comment = comment
        self._user = user
        self._timestamp = timestamp or _now()

    @property
    def comment(self) -> str:
        return self._comment

    @comment.setter
    def comment(self, value: str) -> None:
        self._comment = value
        self._timestamp = _now()

    @property
    def user(self) -> str:
        return self._user

    @property
    def timestamp(self) -> datetime:
        return self._timestamp

    def __str__(self) -> str:
        return (
            f"{self._comment} ({self._user} "
            f"{self._timestamp.strftime('%m/%d/%Y, %H:%M:%S')})"
        )

    __repr__ = __str__

    def to_dict(self) -> dict:
        return {
            "comment": self._comment,
            "user": self._user,
            "timestamp": self._timestamp.isoformat(),
        }

    @classmethod
    def from_dict(cls, data: dict) -> "CellCommentPost":
        ts = data.get("timestamp")
        return cls(
            data["comment"],
            data.get("user", "admin"),
            datetime.fromisoformat(ts) if ts else None,
        )


class CellComments:
    """The comment THREAD of one cell — multiple posts, multiple users
    (reference ``comments.py:37-72``: list surface with index get/set/del,
    iteration, append, clear)."""

    def __init__(self, comment: Optional[CellCommentPost] = None):
        self._comments: list[CellCommentPost] = []
        if comment is not None:
            self._comments.append(comment)

    def __getitem__(self, index: int) -> CellCommentPost:
        return self._comments[index]

    def __setitem__(self, index: int, value: CellCommentPost) -> None:
        self._comments[index] = value

    def __delitem__(self, index: int) -> None:
        del self._comments[index]

    def __len__(self) -> int:
        return len(self._comments)

    def __iter__(self) -> Iterator[CellCommentPost]:
        return iter(self._comments)

    def append(self, comment: CellCommentPost) -> None:
        self._comments.append(comment)

    def clear(self) -> None:
        self._comments.clear()

    def __str__(self) -> str:
        return ", ".join(str(c) for c in self._comments)

    __repr__ = __str__


class CubeComments:
    """All cell comments of one cube, keyed by idx-address (reference
    ``comments.py:75-111``).  Name-address conveniences (`add`,
    `for_address`) resolve through the cube so callers can use member
    names; aggregated cells are valid targets (the reference allows
    comments "to all levels in cube")."""

    def __init__(self, cube):
        self._cube = cube
        self._cell_comments: dict[tuple[int, ...], CellComments] = {}

    # -------------------------------------------------- reference surface
    def __getitem__(self, idx_address) -> Optional[CellComments]:
        return self._cell_comments.get(tuple(idx_address))

    def __setitem__(self, idx_address, value: CellComments) -> None:
        self._cell_comments[tuple(idx_address)] = value

    def __delitem__(self, idx_address) -> None:
        del self._cell_comments[tuple(idx_address)]

    def __len__(self) -> int:
        return len(self._cell_comments)

    def __iter__(self) -> Iterator[CellComments]:
        return iter(self._cell_comments.values())

    def clear(self) -> None:
        self._cell_comments.clear()

    def contains(self, idx_address) -> bool:
        return tuple(idx_address) in self._cell_comments

    # ------------------------------------------------- name conveniences
    def add(
        self, address: Sequence, comment: str, user: str = "admin"
    ) -> CellCommentPost:
        """Post a comment on a cell by MEMBER NAMES; appends to the
        existing thread if one exists."""
        idx, _ = self._cube._resolve_address(address)
        post = CellCommentPost(comment, user)
        thread = self._cell_comments.get(idx)
        if thread is None:
            self._cell_comments[idx] = CellComments(post)
        else:
            thread.append(post)
        return post

    def for_address(self, address: Sequence) -> Optional[CellComments]:
        idx, _ = self._cube._resolve_address(address)
        return self._cell_comments.get(idx)

    # --------------------------------------------------------- persistence
    def to_list(self) -> list:
        return [
            [list(idx), [p.to_dict() for p in thread]]
            for idx, thread in self._cell_comments.items()
        ]

    def load_list(self, data: list) -> None:
        self._cell_comments.clear()
        for idx, posts in data:
            thread = CellComments()
            for p in posts:
                thread.append(CellCommentPost.from_dict(p))
            self._cell_comments[tuple(int(i) for i in idx)] = thread
