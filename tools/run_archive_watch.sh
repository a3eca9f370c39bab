#!/bin/bash
# Periodically snapshot campaign outputs into the committed results/ tree
# (see tools/archive_results.py) and commit when anything changed, so
# training progress survives the per-round microVM resets even if the
# session ends mid-campaign.
set -u
cd "$(dirname "$0")/.."
INTERVAL="${1:-300}"
while true; do
    python tools/archive_results.py >> /tmp/archive_watch.log 2>&1
    if ! git diff --quiet --exit-code -- results/ 2>/dev/null \
       || [ -n "$(git status --porcelain -- results/)" ]; then
        # Pathspec-limited add+commit: never sweeps unrelated staged
        # changes into a snapshot, and tolerates a concurrent
        # interactive git holding index.lock (retried next interval).
        if git add -- results/ 2>>/tmp/archive_watch.log; then
            n=$(git diff --cached --numstat -- results/ | wc -l)
            git commit -q -m "Campaign snapshot: $n results files updated" \
                    -- results/ \
                && echo "$(date -u +%H:%M:%S) committed $n files" \
                    >> /tmp/archive_watch.log
        else
            echo "$(date -u +%H:%M:%S) git add failed (index lock?); will retry" \
                >> /tmp/archive_watch.log
        fi
    fi
    sleep "$INTERVAL"
done
