// BZip2 — implemented in a later milestone this round.
#pragma once
