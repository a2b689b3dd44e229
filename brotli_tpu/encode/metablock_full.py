"""Full metablock path: block splitting + context modeling (metablock.ts:504-761).

Falls back to the trivial path exactly when the reference does
(length < 128 or quality < 5 or fewer than 6 commands).
"""

from __future__ import annotations

from .bitwriter import BitWriter
from .command import Command
from .metablock import store_metablock_trivial


def store_metablock(
    w: BitWriter,
    data,
    start_pos: int,
    length: int,
    mask: int,
    is_last: bool,
    commands: list[Command],
    dist_alphabet_size: int,
    quality: int,
    npostfix: int = 0,
    ndirect: int = 0,
    mode: int = 0,
) -> None:
    if length < 128 or quality < 5 or len(commands) < 6:
        store_metablock_trivial(
            w, data, start_pos, length, mask, is_last, commands,
            dist_alphabet_size, npostfix, ndirect,
        )
        return
    # TODO(block-split): full path lands with the block splitter; until then
    # the trivial store is used (valid stream, larger than reference).
    store_metablock_trivial(
        w, data, start_pos, length, mask, is_last, commands,
        dist_alphabet_size, npostfix, ndirect,
    )
