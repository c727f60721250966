#!/bin/bash
# Commit helper: message is $1, optional files to stage are $2...
cd /root/repo
msg="$1"; shift
if [ "$#" -gt 0 ]; then git add -f "$@"; fi
git commit -m "$msg"
git log --oneline -1
