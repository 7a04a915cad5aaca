#!/bin/bash
# Run a heavy session job serialized against the scaling-pair loop:
# waits for any in-flight pair attempt to finish, then holds the heavy
# lock so the loop skips attempts for the job's duration.
set -u
while [ -e /tmp/esbench_pair.lock ]; do sleep 20; done
touch /tmp/esbench_heavy.lock
trap 'rm -f /tmp/esbench_heavy.lock' EXIT
"$@"
