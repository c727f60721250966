#!/bin/bash
# Evidence staging helper (runs/ is gitignored; cited artifacts must be
# force-added — VERDICT r4 #2).
cd /root/repo
git add -f "$@"
git status --short | grep "^A" | head -20
