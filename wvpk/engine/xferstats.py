"""Transfer-byte accounting for the delivery path.

`launch_bucket`/`launch_dsd_states` add the bytes they stage to the
device (H2D) and `_fetch_arrays` the bytes of its single batched fetch
(D2H). The bench's structural-bound measurement divides these by the
link rate measured in the same run to derive the delivery ceiling the
pipeline is judged against (NOTES.md round-4 delivery note); the
report tooling can surface them too. Counting happens on the host at
enqueue time — it is the payload byte count, not a transport-level
measurement."""

counters = {"h2d": 0, "d2h": 0}


def reset() -> None:
    counters["h2d"] = 0
    counters["d2h"] = 0


def add(direction: str, nbytes: int) -> None:
    counters[direction] += int(nbytes)
