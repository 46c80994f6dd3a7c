"""Misc utilities: balanced grouping of variable-length work.

Twin of /root/reference/src/groups.rs:9-67 (make_equal_groups): greedy
contiguous partition of blocks into ~equal-size groups, used to balance
variable-length reads across parallel workers / device batches.
"""

from __future__ import annotations


def make_equal_groups(blocks_size, nbgroup: int) -> list[int]:
    """Return frontiers f so group i spans blocks [f[i], f[i+1]);
    f[-1] == len(blocks_size).  Same greedy rule as groups.rs:20-62."""
    total = sum(blocks_size)
    equal_group = round(total / nbgroup)
    frontiers = [0]
    nb_blocks = len(blocks_size)
    nb_group = 1
    b = 0
    cumul = 0
    while b < nb_blocks:
        if cumul + blocks_size[b] <= equal_group * nb_group:
            cumul += blocks_size[b]
            b += 1
        else:
            excess = cumul + blocks_size[b] - equal_group * nb_group
            default = equal_group * nb_group - cumul
            if excess <= default:
                frontiers.append(b + 1)
            else:
                frontiers.append(b)
            cumul += blocks_size[b]
            b += 1
            nb_group += 1
    if frontiers[-1] < nb_blocks:
        frontiers.append(nb_blocks)
    return frontiers
