#!/bin/bash
# Remove python bytecode caches (reference: tools/rm_pyc.sh)
cd "$(dirname "$0")/.."
find . -name "__pycache__" -type d -prune -exec rm -rf {} +
find . -name "*.pyc" -delete
echo "cleaned"
