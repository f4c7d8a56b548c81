#!/bin/sh
# Attempt to build the reference's Rust bloomd server (/root/reference/src,
# Cargo.toml) with the in-sandbox toolchain, recording the outcome — the
# round-4 stretch item asked for a Rust serve-back "or record why not".
#
# Outcome (reproduced by this script): the source is PRE-1.0 Rust
# (circa 1.0.0-alpha, Jan 2015) — `std::io::fs`, `std::io::TcpListener`,
# `std::io::process`, two-generic `FnMut<Args, Ret>` impls,
# `#![feature(unsafe_destructor)]` — all REMOVED from std before 1.0,
# not merely feature-gated, so neither stable nor nightly 1.95 can
# compile it (79 errors; E0658 x47, E0432/E0433 removed modules,
# E0554 feature gate on a removed feature). No period toolchain exists
# in-sandbox and none can be fetched (zero egress). A hand-migration to
# modern Rust would (a) no longer be the *reference* binary answering —
# every structural rewrite (threading, sockets, closures) would be ours —
# and (b) require vendoring mutated reference source into this repo,
# which the round rules forbid copying.
#
# What this does NOT leave unvalidated: the Rust daemon's entire data
# plane is FFI into the same csrc/libbloom C library this repo already
# hand-builds and serve-back-proves (reference/src/bitmap.rs:104-118 and
# bloom.rs `mod externals` link `-lbloom` for bitmap_*, bf_*,
# bf_compute_hashes — the functions ServeBackSpec exercises through the
# C daemon against this engine's exports). The Rust-side remainder —
# counting LBF semantics, wire protocol, INI/folder layout — is covered
# from this side by the byte-exact golden protocol replay
# (op_rust_wire_trace) and the export/restore round-trips
# (op_export_roundtrip, op_bloomd_restore).
set -x
REF=${REF:-/root/reference}
OUT=${1:-/root/repo/target/rustref}
rm -rf "$OUT"; mkdir -p "$OUT"
cp -r "$REF/src" "$REF/Cargo.toml" "$REF/Cargo.lock" "$OUT/"
# build.rs only invokes scons for libbloom.a; drop it so the log shows
# the SOURCE errors, not the missing-scons error.
sed -i 's|build = "build.rs"||' "$OUT/Cargo.toml"
cd "$OUT"
rustc --version > rustc_version.txt 2>&1
rustup toolchain list >> rustc_version.txt 2>&1
cargo build > build_attempt.log 2>&1
status=$?
grep -c '^error' build_attempt.log > error_count.txt
echo "cargo exit: $status ($(cat error_count.txt) errors) — see $OUT/build_attempt.log"
exit 0
