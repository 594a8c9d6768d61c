#!/bin/bash
# Count lines of code per language (reference: tools/cloc.sh)
cd "$(dirname "$0")/.."
echo "== Python (vats_tpu + scripts + tests + tools)"
find vats_tpu scripts tests tools -name "*.py" | xargs wc -l | tail -1
echo "== C (native)"
find vats_tpu -name "*.c" | xargs wc -l 2>/dev/null | tail -1
echo "== per package"
for d in vats_tpu/*/; do
  printf "%-24s %s\n" "$d" "$(find "$d" -name '*.py' | xargs cat 2>/dev/null | wc -l)"
done
