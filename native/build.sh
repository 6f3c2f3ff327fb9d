#!/bin/bash
# Build the moshi_native extension (streaming ogg-opus codec).
# Links libopus by its versioned soname (no dev package on this image).
set -e
cd "$(dirname "$0")"
PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
EXT=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
g++ -O2 -shared -fPIC -std=c++17 -I"$PYINC" moshi_native.cpp \
    -l:libopus.so.0 -o "../moshi_tpu/moshi_native$EXT"
echo "built moshi_tpu/moshi_native$EXT"
