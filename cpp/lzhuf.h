// LZHUF (LHA lh4-lh7) — implemented in a later milestone this round.
#pragma once
