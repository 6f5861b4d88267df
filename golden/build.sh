#!/bin/bash
# Build the golden-parity tools against the REFERENCE'S OWN host C++.
#
# The reference's parameters.h initializes `static const double` members
# in-class — an nvcc/icpc extension g++ rejects.  We stage a build tree
# under golden/build/src (gitignored): symlinks to the read-only
# reference sources plus ONE mechanically patched header in which
# `#define STCONST static const` becomes `static constexpr` (identical
# semantics, standard C++17).  No reference code is committed.
set -euo pipefail
cd "$(dirname "$0")"
REF=/root/reference/src
mkdir -p build/src

for f in SimulationBox.h SimulationBox.cpp BacteriaBox.h BacteriaBox.cpp \
         octree.h octree.cpp rand_walk.h xorshift.h; do
    ln -sf "$REF/$f" "build/src/$f"
done
sed 's/#define STCONST static const/#define STCONST static constexpr/' \
    "$REF/parameters.h" > build/src/parameters.h

CXX=${CXX:-g++}
FLAGS="-O3 -march=native -std=c++17 -w -pthread -fno-math-errno -Ibuild/src"
SRCS="build/src/SimulationBox.cpp build/src/BacteriaBox.cpp build/src/octree.cpp"

$CXX $FLAGS ref_scene_dump.cpp $SRCS -o build/ref_scene_dump
if [ -f ref_t2_oracle.cpp ]; then
    $CXX $FLAGS -fopenmp ref_t2_oracle.cpp $SRCS -o build/ref_t2_oracle
fi
echo "golden tools built: $(ls build/ref_* 2>/dev/null | tr '\n' ' ')"
