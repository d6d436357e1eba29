#!/bin/sh
# Standalone DESTINATION connector plugin in POSIX sh — the write half
# of the any-language JSON-lines protocol (see counter-source.awk for
# the source half). The engine runs ONE CHILD PER PARTITION on the
# executors and streams envelope objects after the configure line; the
# child answers exactly one {"ok":true} / {"ok":false,...} ack per
# record and exits when stdin closes.
#
# Settings used: path (output PREFIX — every child appends ".$$", its
# own pid, so the N per-partition children write disjoint part files
# like a distributed sink must; readers glob "<path>.*"). Each record's
# payload_after_json is appended as one line, extracted with sed (no
# jq dependency so the example runs anywhere a shell does).

path=""
first=1
while IFS= read -r line; do
    if [ "$first" = 1 ]; then
        first=0
        # configure line: {"cmd":"configure","settings":{"path":"..."},...}
        path=$(printf '%s' "$line" | sed -n 's/.*"path"[: ]*"\([^"]*\)".*/\1/p')
        [ -n "$path" ] || { printf '{"ok":false,"error":"no path setting"}\n'; exit 1; }
        path="$path.$$"
        : > "$path" || { printf '{"ok":false,"error":"cannot open path"}\n'; exit 1; }
        continue
    fi
    payload=$(printf '%s' "$line" | sed -n 's/.*"payload_after_json"[: ]*"\(\(\\.\|[^"\\]\)*\)".*/\1/p')
    if [ -z "$payload" ]; then
        printf '{"ok":false,"error":"record without payload_after_json"}\n'
        continue
    fi
    # un-escape the JSON-string payload (\" -> ", \\ -> \)
    printf '%s\n' "$payload" | sed 's/\\"/"/g; s/\\\\/\\/g' >> "$path"
    printf '{"ok":true}\n'
done
exit 0
