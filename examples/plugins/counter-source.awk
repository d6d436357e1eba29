#!/usr/bin/awk -f
# Standalone SOURCE connector plugin written in awk — proof that the
# JSON-lines protocol of conduit_spark.sources.standalone (the engine's
# analog of the reference's gRPC standalone dispenser,
# pkg/plugin/connector/standalone/dispenser.go:25) is language-agnostic:
# no SDK, no Python, just stdin/stdout.
#
# Protocol recap:
#   line 1 (stdin):  {"cmd":"configure","settings":{...},"connector_id":".."}
#   then (stdout):   one envelope JSON object per line; exit 0 when drained.
#
# Settings used: count (records to emit, default 10), collection
# (metadata tag, default "items"). Positions are base64("rec-<n>") per
# the envelope contract (binary fields travel base64).

function b64(s,    out, i, n, c1, c2, c3, pad, tbl, ascii) {
    tbl = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
    # printable-ASCII ord() lookup (all our position bytes are printable)
    ascii = " !\"#$%&'()*+,-./0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ" \
            "[\\]^_`abcdefghijklmnopqrstuvwxyz{|}~"
    out = ""
    for (i = 1; i <= length(s); i += 3) {
        c1 = index(ascii, substr(s, i, 1)) + 31
        c2 = (i + 1 <= length(s)) ? index(ascii, substr(s, i + 1, 1)) + 31 : 0
        c3 = (i + 2 <= length(s)) ? index(ascii, substr(s, i + 2, 1)) + 31 : 0
        n = c1 * 65536 + c2 * 256 + c3
        pad = (i + 2 > length(s)) ? ((i + 1 > length(s)) ? 2 : 1) : 0
        out = out substr(tbl, int(n / 262144) + 1, 1) \
                  substr(tbl, int(n / 4096) % 64 + 1, 1)
        out = out ((pad >= 2) ? "=" : substr(tbl, int(n / 64) % 64 + 1, 1))
        out = out ((pad >= 1) ? "=" : substr(tbl, n % 64 + 1, 1))
    }
    return out
}

NR == 1 {
    # configure line: pull the two settings we understand with plain
    # pattern matches (values arrive as JSON strings or numbers)
    count = 10
    coll = "items"
    if (match($0, /"count"[: ]*"?[0-9]+/)) {
        v = substr($0, RSTART, RLENGTH)
        gsub(/[^0-9]/, "", v)
        count = v + 0
    }
    if (match($0, /"collection"[: ]*"[A-Za-z0-9_-]+"/)) {
        v = substr($0, RSTART, RLENGTH)
        gsub(/.*: *"/, "", v)
        gsub(/"/, "", v)
        coll = v
    }
    for (i = 1; i <= count; i++) {
        sq = (i % 7) * (i % 7)
        printf "{\"position\":\"%s\",\"operation\":\"create\"," \
               "\"metadata\":{\"plugin\":\"awk-counter\",\"opencdc.collection\":\"%s\"}," \
               "\"key_json\":\"{\\\"id\\\": %d}\"," \
               "\"payload_after_json\":\"{\\\"id\\\": %d, \\\"name\\\": \\\"item-%d\\\", \\\"mod7_sq\\\": %d}\"," \
               "\"is_structured\":true}\n",
               b64("rec-" i), coll, i, i, i, sq
    }
    exit 0
}
