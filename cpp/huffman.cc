#include "huffman.h"

#include <algorithm>
#include <cstring>

namespace tpz {

namespace {

// Package-merge item: weight plus the multiset of leaves it contains,
// represented as per-symbol counts folded into a vector of symbol ids
// (small alphabets make this cheap; nsyms <= 510, limit <= 20).
struct Item {
  uint64_t weight;
  // Sort key for determinism: leaves order before packages of equal
  // weight; among leaves, lower symbol first. Packages carry the lowest
  // contained symbol for a stable, implementation-independent order.
  bool is_package;
  int min_sym;
  std::vector<int> leaves;  // symbol ids, with multiplicity
};

bool ItemLess(const Item& a, const Item& b) {
  if (a.weight != b.weight) return a.weight < b.weight;
  if (a.is_package != b.is_package) return !a.is_package;  // leaves first
  return a.min_sym < b.min_sym;
}

}  // namespace

bool PackageMergeLengths(const uint32_t* freqs, int nsyms, int limit,
                         uint8_t* lengths) {
  std::memset(lengths, 0, nsyms);
  std::vector<int> active;
  for (int i = 0; i < nsyms; ++i)
    if (freqs[i] > 0) active.push_back(i);
  const int n = (int)active.size();
  if (n == 0) return true;
  if (n == 1) {
    lengths[active[0]] = 1;
    return true;
  }
  if ((int64_t)n > (int64_t)1 << limit) return false;

  // Leaves sorted by (freq, symbol).
  std::vector<Item> leaves(n);
  for (int k = 0; k < n; ++k) {
    leaves[k].weight = freqs[active[k]];
    leaves[k].is_package = false;
    leaves[k].min_sym = active[k];
    leaves[k].leaves = {active[k]};
  }
  std::sort(leaves.begin(), leaves.end(), ItemLess);

  // Iterate limit levels: list_l = merge(leaves, package(list_{l-1})).
  std::vector<Item> prev = leaves;
  for (int level = 1; level < limit; ++level) {
    std::vector<Item> packages;
    for (size_t k = 0; k + 1 < prev.size(); k += 2) {
      Item p;
      p.weight = prev[k].weight + prev[k + 1].weight;
      p.is_package = true;
      p.min_sym = std::min(prev[k].min_sym, prev[k + 1].min_sym);
      p.leaves = prev[k].leaves;
      p.leaves.insert(p.leaves.end(), prev[k + 1].leaves.begin(),
                      prev[k + 1].leaves.end());
      packages.push_back(std::move(p));
    }
    std::vector<Item> merged;
    merged.reserve(leaves.size() + packages.size());
    std::merge(leaves.begin(), leaves.end(), packages.begin(), packages.end(),
               std::back_inserter(merged), ItemLess);
    prev = std::move(merged);
  }

  // Count leaf occurrences in the first 2(n-1) items of the final list.
  const size_t take = 2 * (size_t)(n - 1);
  for (size_t k = 0; k < take && k < prev.size(); ++k)
    for (int sym : prev[k].leaves) ++lengths[sym];
  return true;
}

void CanonicalCodes(const uint8_t* lengths, int nsyms, uint32_t* codes) {
  int max_len = 0;
  int count[33] = {0};
  for (int i = 0; i < nsyms; ++i) {
    ++count[lengths[i]];
    if (lengths[i] > max_len) max_len = lengths[i];
  }
  count[0] = 0;
  uint32_t code = 0;
  uint32_t next_code[33] = {0};
  for (int len = 1; len <= max_len; ++len) {
    code = (code + count[len - 1]) << 1;
    next_code[len] = code;
  }
  for (int i = 0; i < nsyms; ++i)
    codes[i] = lengths[i] ? next_code[lengths[i]]++ : 0;
}

bool BuildDecodeTable(const uint8_t* lengths, int nsyms, bool lsb_stream,
                      HuffDecodeTable* t) {
  int max_len = 0;
  int64_t kraft = 0;
  for (int i = 0; i < nsyms; ++i)
    if (lengths[i]) {
      max_len = std::max(max_len, (int)lengths[i]);
      kraft += (int64_t)1 << (32 - lengths[i]);
    }
  t->bits = max_len;
  if (max_len == 0) {
    t->entries.clear();
    t->complete = false;
    return true;
  }
  if (kraft > (int64_t)1 << 32) return false;  // over-subscribed
  t->complete = kraft == (int64_t)1 << 32;

  std::vector<uint32_t> codes(nsyms);
  CanonicalCodes(lengths, nsyms, codes.data());
  t->entries.assign((size_t)1 << max_len, 0);
  for (int i = 0; i < nsyms; ++i) {
    int len = lengths[i];
    if (!len) continue;
    uint32_t span = 1u << (max_len - len);
    uint32_t packed = ((uint32_t)i << 5) | (uint32_t)len;
    if (lsb_stream) {
      uint32_t code = codes[i], rev = 0;
      for (int b = 0; b < len; ++b) {
        rev = (rev << 1) | (code & 1);
        code >>= 1;
      }
      for (uint32_t k = 0; k < span; ++k)
        t->entries[rev + (k << len)] = packed;
    } else {
      uint32_t base = (uint32_t)codes[i] << (max_len - len);
      for (uint32_t k = 0; k < span; ++k) t->entries[base + k] = packed;
    }
  }
  return true;
}

}  // namespace tpz
