/* Native ASCII PPM (P3) tokenizer/parser.
 *
 * Host-native fast path for the byte-wise tokenizer loop that dominates
 * large P3 ingests (reference behavior: src/image/reader/ppm.rs:44-78).
 * Semantics matched:
 *   - whitespace = space \t \n \f \r (Rust u8::is_ascii_whitespace)
 *   - '#' starts a comment that runs to '\n' and does NOT terminate the
 *     token being accumulated (ppm.rs:49-58)
 *   - every token after the "P3" magic must parse as u16 (0..=65535)
 *
 * Returns the number of u16 values written to out (width, height, maxval,
 * then the color components), or:
 *   -1 output capacity exceeded, -2 token parse failure, -3 missing P3 magic.
 */

#include <stdint.h>
#include <stddef.h>

static inline int is_ws(uint8_t b) {
    return b == ' ' || b == '\t' || b == '\n' || b == '\f' || b == '\r';
}

long dmmt_parse_ppm(const uint8_t *data, long n, uint16_t *out, long cap) {
    long i = 0, count = 0;
    int in_comment = 0;
    int have_magic = 0;

    /* token accumulator: value for numeric tokens, plus raw-prefix check for magic */
    uint32_t value = 0;
    int token_len = 0;
    int token_bad = 0;
    uint8_t t0 = 0, t1 = 0;

    for (;;) {
        int end_of_input = (i >= n);
        uint8_t b = end_of_input ? ' ' : data[i];
        if (!end_of_input) {
            i++;
            if (in_comment) {
                if (b == '\n') in_comment = 0;
                continue;
            }
            if (b == '#') { in_comment = 1; continue; }
            if (!is_ws(b)) {
                if (token_len == 0) t0 = b;
                else if (token_len == 1) t1 = b;
                if (b >= '0' && b <= '9') {
                    value = value * 10u + (uint32_t)(b - '0');
                    if (value > 65535u) token_bad = 1;
                } else {
                    token_bad = 1;
                }
                token_len++;
                continue;
            }
        }
        /* whitespace or end: close any token */
        if (token_len > 0) {
            if (!have_magic) {
                if (token_len == 2 && t0 == 'P' && t1 == '3') {
                    have_magic = 1;
                } else {
                    return -3;
                }
            } else {
                if (token_bad) return -2;
                if (count >= cap) return -1;
                out[count++] = (uint16_t)value;
            }
            value = 0;
            token_len = 0;
            token_bad = 0;
        }
        if (end_of_input) break;
    }
    if (!have_magic) return -3;
    return count;
}
