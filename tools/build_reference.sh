#!/bin/sh
# Build the reference lordfast binary into .refbuild/ for bench.py's
# live baseline measurement (bench.py uses the recorded constants when
# .refbuild/lordfast is absent).  The vendored copy is gitignored: it
# is the reference's own source, used ONLY to produce the baseline
# binary on the same machine the engine is benchmarked on.
#
# Usage: tools/build_reference.sh [path-to-reference-src]
set -e
SRC=${1:-/root/reference}
cd "$(dirname "$0")/.."
rm -rf .refbuild
cp -r "$SRC" .refbuild
cd .refbuild
# the reference's Makefile renders its man page with groff into a
# linked-in binary blob; machines without groff can link any text --
# the HELP contents do not affect mapping (src/CommandLineParser.cpp
# only prints it for -h)
if ! command -v groff >/dev/null 2>&1; then
    cp HELP.man HELP
    ld -r -b binary -o HELP.o HELP
fi
# 'make all' ends with a clean that deletes HELP.o; build the pieces
make clasplib bwalib
make lordfast
./lordfast 2>&1 | head -2 || true
echo "built: $(pwd)/lordfast"
