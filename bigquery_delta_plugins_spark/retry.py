"""Retry policy with permanent-failure classification.

The reference wraps every DDL apply / offset commit in a Failsafe
``RetryPolicy`` that backs off exponentially on transient errors but
ABORTS immediately when the error is classified non-recoverable
(``abortOn(ex -> ex instanceof DeltaFailureException)``,
BigQueryEventConsumer.java:312-335; invalid-operation classification
``isInvalidOperationError`` :326-330; commit policy :229-234).  This is
the Spark-native equivalent: Spark's own task retries cover executor-
side faults, so this policy guards the DRIVER-side lake mutations (DDL,
manifest commits) where a blind retry of a permanent error would spin
forever — the reference's exact motivation.

No randomness (deterministic capped exponential backoff) so replays and
tests are reproducible.
"""

from __future__ import annotations

import time
from typing import Callable


class PermanentFailure(RuntimeError):
    """Non-recoverable apply error: retrying cannot help (unsupported
    DDL, schema conflict, manual-drop policy).  The analogue of the
    reference's DeltaFailureException — a retry loop must abort on it
    (BigQueryEventConsumer.java:313,326-330)."""


class RetriesExhausted(RuntimeError):
    """All attempts failed with transient errors; the last one is the
    ``__cause__`` (the reference's "Exhausted retries trying to apply"
    wrapper, BigQueryEventConsumer.java:334)."""


def run_with_retry(
    fn: Callable[[], object],
    *,
    max_attempts: int = 3,
    base_delay: float = 0.2,
    max_delay: float = 30.0,
    is_permanent: Callable[[BaseException], bool] | None = None,
    sleep: Callable[[float], None] = time.sleep,
):
    """Run ``fn`` under the reference's retry semantics.

    - ``PermanentFailure`` (or any error ``is_permanent`` classifies as
      such) propagates IMMEDIATELY — exactly one attempt, like the
      reference's abortOn (tested against
      testPermanentFailureIsNotRetriedInProcessDDL,
      BigQueryConsumerTest.java:723-747).
    - any other exception is retried with deterministic exponential
      backoff (base_delay * 2^i, capped) up to ``max_attempts``, then
      raised wrapped in :class:`RetriesExhausted`
      (testTemporaryFailureIsRetriedInProcessDDL, :749-786).
    """
    last: BaseException | None = None
    for attempt in range(max_attempts):
        try:
            return fn()
        except PermanentFailure:
            raise
        except BaseException as e:  # noqa: BLE001 — classification point
            if is_permanent is not None and is_permanent(e):
                raise PermanentFailure(
                    f"non-recoverable error, aborting retries: {e}"
                ) from e
            last = e
            if attempt + 1 < max_attempts:
                sleep(min(max_delay, base_delay * (2**attempt)))
    raise RetriesExhausted(
        f"exhausted {max_attempts} attempts; last error: {last}"
    ) from last
